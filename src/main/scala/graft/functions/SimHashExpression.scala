package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd 64-bit SimHash of a string array: per-bit ±1 votes of each
  * element's xxhash64 (seed 42), bit set where the vote sum is positive —
  * bit-identical to [[TextFunctions.simhash64]] (including null elements,
  * which vote with the bare seed, exactly as `xxhash64(null)` evaluates in
  * the HOF fold) and to the explode + 64-column-aggregate formulation.
  *
  * This expression exists because both alternatives have the wrong shape:
  * the higher-order-function fold evaluates interpreted (a closure dispatch
  * and a fresh 64-element array per token), and the explode + groupBy
  * formulation shuffles one row per token — at 100 TB that is a shuffle of
  * the entire tokenized corpus for a value that is computable per row in a
  * single pass. Here each document costs one string hash per token and a
  * 64-iteration vote loop, fully inside whole-stage codegen, and the
  * operator needs no exchange at all.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      // null elements vote with the bare seed (42): Spark's xxhash64 skips
      // null inputs leaving the hash at its seed, so the HOF formulation
      // votes 42's bits for a null token — match it bit for bit
      val h =
        if (arr.isNullAt(j)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var b = 0
      while (b < 64) {
        votes(b) += (((h >>> b) & 1L).toInt << 1) - 1 // +1 if set, -1 if not
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[64];
         |int $n = $a.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $a.isNullAt($j)
         |    ? 42L : $xxh.hashUTF8String($a.getUTF8String($j), 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $votes[$b] += ((int) (($h >>> $b) & 1L) << 1) - 1;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $out |= 1L << $b;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHashFunctions {
  /** Codegen'd 64-bit SimHash (array<string> -> bigint). */
  def simhash(tokens: Column): Column =
    Bridge.column(SimHash64Expr(Bridge.expression(tokens)))
}

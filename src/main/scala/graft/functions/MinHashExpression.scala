package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd MinHash signature of a string array: for each element,
  * h1 = xxhash64(bytes, seed 42), h2 = xxhash64(h1, seed 42), and
  * signature[i] = min over elements of (h1 + i*h2)
  * (Kirsch-Mitzenmacher double hashing — one string hash per element).
  *
  * Semantics match [[TextFunctions.minhashSignature]] exactly (Spark's
  * `xxhash64` uses seed 42); this expression exists because higher-order
  * functions evaluate interpreted: the HOF formulation allocates k
  * intermediate arrays and dispatches a closure per element per hash,
  * where this compiles to one tight loop with a k-length local array —
  * the difference is ~5-10x on shingle-heavy corpora, multiplied by
  * every document at 100 TB.
  */
case class MinHashSignatureExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0, "k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        val h1 = XXH64.hashUTF8String(s, 42L)
        val h2 = XXH64.hashLong(h1, 42L)
        var i = 0
        var h = h1
        while (i < k) {
          if (h < mins(i)) mins(i) = h
          h += h2 // h1 + i*h2 built incrementally
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$a.isNullAt($j)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($j);
         |    long $h1 = $xxh.hashUTF8String($s, 42L);
         |    long $h2 = $xxh.hashLong($h1, 42L);
         |    long $h = $h1;
         |    for (int $i = 0; $i < $k; $i++) {
         |      if ($h < $mins[$i]) $mins[$i] = $h;
         |      $h += $h2;
         |    }
         |  }
         |}
         |${ev.value} = new $gad($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHashFunctions {
  /** Codegen'd MinHash signature (array<string> -> array<bigint>[k]). */
  def minhashSig(shingles: Column, k: Int): Column =
    Bridge.column(MinHashSignatureExpr(Bridge.expression(shingles), k))
}

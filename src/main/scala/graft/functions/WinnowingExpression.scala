package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD'03 — the MOSS algorithm): Rabin-Karp rolling hashes of every
  * k-byte gram, a sliding window of `w` hashes, the RIGHTMOST minimum of
  * each window selected. Guarantee: two documents sharing any substring of
  * at least `w + k - 1` bytes share at least one selected fingerprint —
  * which is what makes fingerprints usable as LSH bucket keys for
  * copy/quotation detection where shingle-Jaccard is too coarse.
  *
  * One O(n) pass per document (monotonic-deque window minimum), fully
  * inside whole-stage codegen via a static helper call, no exchange —
  * the same shape argument as [[SimHash64Expr]]. Output: sorted distinct
  * fingerprint hashes (`array<bigint>`).
  */
object Winnowing {

  private final val Base = 257L

  /** 64-bit finalizer (murmur fmix64) so window minima are uniform —
    * raw polynomial hashes of similar grams cluster. */
  private def mix(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** Java-callable from generated code (static forwarder). */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    if (n < k) return new GenericArrayData(Array(mix(polyAll(bytes))))
    val m = n - k + 1 // number of k-grams
    val hashes = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    hashes(0) = mix(h)
    var top = 1L // Base^(k-1)
    i = 1; while (i < k) { top *= Base; i += 1 }
    i = 1
    while (i < m) {
      h = (h - (bytes(i - 1) & 0xff) * top) * Base + (bytes(i + k - 1) & 0xff)
      hashes(i) = mix(h)
      i += 1
    }
    // rightmost-min over windows of w hashes via a monotonic deque of
    // indices (strictly increasing hash values; ties evict, giving the
    // RIGHTMOST minimal — the relative rule the w+k-1 guarantee needs)
    val deque = new Array[Int](m)
    var head = 0; var tail = 0 // [head, tail)
    val selected = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i < m) {
      // evict larger-or-equal from the back: >= keeps the RIGHTMOST of a
      // tie at the front, the relative rule the w+k-1 guarantee needs
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      while (deque(head) < i - w + 1) head += 1 // out-of-window minima
      if (i >= w - 1) selected.add(hashes(deque(head)))
      i += 1
    }
    if (m < w) selected.add(hashes(deque(head))) // short doc: global min
    val out = new Array[Long](selected.size())
    val it = selected.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  private def polyAll(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    h
  }
}

case class WinnowExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 2 && w >= 1, s"winnow needs k >= 2 and w >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"winnow requires string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    Winnowing.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.Winnowing.winnow($t, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}

object WinnowingFunctions {
  /** Winnowing fingerprint sketch (string -> sorted array<bigint>):
    * guaranteed to overlap between documents sharing >= w+k-1 bytes. */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 16): Column =
    Bridge.column(WinnowExpr(Bridge.expression(text), k, w))
}

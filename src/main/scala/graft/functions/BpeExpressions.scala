package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd byte-pair-encoding (BPE) tokenization — the subword
  * sibling of [[VocabIdsExpr]] (reference pattern: the reference's
  * token-count pass, `pi/ex`, stops at whitespace tokens; this is the
  * trainer-real id mapping real pipelines ship — Sennrich et al.
  * arXiv:1508.07909, the GPT-2 byte-level variant's greedy rank rule).
  *
  * Semantics (EXACTLY mirrored by the DuckDB oracle's recursive replay,
  * and equal to classic sequential merge application — see the
  * equivalence note on [[BpeCodec.segment]]):
  *  - a document splits into words on single 0x20 separators, keeping
  *    empty words (Spark `split(text,' ',-1)` / DuckDB STRING_SPLIT);
  *  - each word seeds as its code-point symbols, then repeatedly the
  *    LOWEST-RANK adjacent symbol pair (leftmost occurrence on ties)
  *    merges, until no adjacent pair is in the merge table;
  *  - symbols map to ids (1-based position in base ++ merges); an
  *    unknown symbol maps to `unk`; one `spaceId` rides between
  *    consecutive words so decode restores the document byte-exactly.
  *
  * The merge table and id table ride into generated code as reference
  * objects (java HashMaps — O(1) per probe); per row the only
  * allocations are the word substrings under merge and the primitive
  * output array. Merge application is O(L²) hash probes worst-case per
  * word, L = word length — bounded by the longest word, independent of
  * corpus size, so the operator stays a pure map pass at 100 TB.
  */
object BpeCodec {
  type Ranks = java.util.HashMap[String, Integer]
  type Ids = java.util.HashMap[String, Integer]

  /** Greedy BPE segmentation of ONE word (no spaces): repeatedly merge
    * the minimum-rank adjacent pair, leftmost occurrence first.
    *
    * Equivalence note (why this equals classic sequential merge
    * application, and why the oracle's one-merge-per-recursion-step
    * replay matches both): any pair CREATED by applying merge k
    * contains merge k's output symbol, and a merge consuming that
    * symbol can only have been learned LATER — so new pairs always
    * carry ranks strictly above the rank just applied, and min-rank-
    * first processes merges in exactly learned order, each exhaustively
    * left-to-right. Suite-pinned by a ScalaCheck property. */
  def segment(word: String, ranks: Ranks): java.util.ArrayList[String] = {
    val syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      syms.add(word.substring(i, i + n))
      i += n
    }
    if (!ranks.isEmpty) {
      var done = syms.size < 2
      while (!done) {
        var best = Int.MaxValue
        var bestAt = -1
        var j = 0
        while (j < syms.size - 1) {
          val r = ranks.get(syms.get(j) + " " + syms.get(j + 1))
          if (r != null && r.intValue < best) { best = r.intValue; bestAt = j }
          j += 1
        }
        if (bestAt < 0) done = true
        else {
          syms.set(bestAt, syms.get(bestAt) + syms.get(bestAt + 1))
          syms.remove(bestAt + 1)
          done = syms.size < 2
        }
      }
    }
    syms
  }

  /** Full-document encode (called reflectively from generated java):
    * words segment independently; `spaceId` interleaves between words
    * (including around empty words, so decode is byte-exact).
    *
    * `byteBase >= 0` enables GPT-2-style byte-level fallback — the
    * zero-OOV mode: a symbol outside the id table (always a single code
    * point; merges only ever produce table symbols) emits one id per
    * UTF-8 byte, `byteBase + 1 + byte`, instead of `unk`. Every string
    * is then encodable and [[decodeIds]] reassembles it byte-exactly —
    * the difference between a demo tokenizer and a trainer-real one. */
  def encodeIds(text: UTF8String, ranks: Ranks, ids: Ids, spaceId: Int,
      unk: Int, byteBase: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    val b = new scala.collection.mutable.ArrayBuilder.ofInt
    b.sizeHint(n / 2 + 1)
    var wordStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        val seg = segment(s.substring(wordStart, i), ranks)
        var k = 0
        while (k < seg.size) {
          val id = ids.get(seg.get(k))
          if (id != null) b += id.intValue
          else if (byteBase < 0) b += unk
          else {
            val bytes = seg.get(k)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            var m = 0
            while (m < bytes.length) {
              b += byteBase + 1 + (bytes(m) & 0xFF)
              m += 1
            }
          }
          k += 1
        }
        if (i < n) b += spaceId
        wordStart = i + 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(b.result())
  }

  /** Byte-exact decode (called reflectively from generated java): table
    * ids append their symbol's UTF-8 bytes, byte-fallback ids append
    * their single byte (so multi-byte code points reassemble exactly),
    * anything else — including a NULL array element from a user-built
    * `array<int>` (containsNull=true passes the type check, and getInt
    * on a null slot is undefined: NPE interpreted, garbage under
    * UnsafeArrayData) — appends `unkBytes`, so both eval paths agree.
    * The assembly works in BYTES — a string-concat decode cannot
    * represent a lone continuation byte. */
  def decodeIds(ids: ArrayData, symBytes: Array[Array[Byte]],
      byteBase: Int, unkBytes: Array[Byte]): UTF8String = {
    val n = ids.numElements()
    val out = new java.io.ByteArrayOutputStream(n * 2)
    var i = 0
    while (i < n) {
      val id = if (ids.isNullAt(i)) -1 else ids.getInt(i)
      if (id >= 1 && id <= symBytes.length)
        out.write(symBytes(id - 1), 0, symBytes(id - 1).length)
      else if (byteBase >= 0 && id > byteBase && id <= byteBase + 256)
        out.write(id - byteBase - 1)
      else out.write(unkBytes, 0, unkBytes.length)
      i += 1
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  /** Segmentation of ONE word as an array of symbol strings — the
    * training-loop surface ([[graft.operators.Bpe.trainMerges]] counts
    * adjacent pairs over it). */
  def segmentArray(word: UTF8String, ranks: Ranks): ArrayData = {
    val seg = segment(word.toString, ranks)
    val out = new Array[AnyRef](seg.size)
    var i = 0
    while (i < seg.size) { out(i) = UTF8String.fromString(seg.get(i)); i += 1 }
    new GenericArrayData(out)
  }

  def ranksMap(merges: Seq[(String, String)]): Ranks = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) => m.put(l + " " + r, i) }
    m
  }

  def idsMap(symbols: Seq[String]): Ids = {
    val m = new java.util.HashMap[String, Integer](symbols.size * 2)
    symbols.zipWithIndex.foreach { case (s, i) => m.put(s, i + 1) }
    m
  }
}

/** text → array<int> of BPE token ids (see [[BpeCodec]]). */
case class BpeIdsExpr(child: Expression, ranks: BpeCodec.Ranks,
    ids: BpeCodec.Ids, spaceId: Int, unk: Int, byteBase: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_ids requires string input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    BpeCodec.encodeIds(input.asInstanceOf[UTF8String], ranks, ids, spaceId,
      unk, byteBase)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = BpeCodec.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val mapCls = classOf[java.util.HashMap[String, Integer]].getCanonicalName
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, mapCls)
    val idsRef = ctx.addReferenceObj("bpeIds", ids, mapCls)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (${classOf[ArrayData].getName}) $helper.encodeIds(
         |  $a, $ranksRef, $idsRef, $spaceId, $unk, $byteBase);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BpeIdsExpr =
    copy(child = newChild)

  override def prettyName: String = "bpe_ids"
}

/** array<int> of BPE ids → text, byte-exact under byte fallback (see
  * [[BpeCodec.decodeIds]]). */
case class BpeDecodeExpr(child: Expression, symBytes: Array[Array[Byte]],
    byteBase: Int, unkToken: String) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_decode requires array<int> input, got $other")
    }

  private lazy val unkBytes =
    unkToken.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def nullSafeEval(input: Any): Any =
    BpeCodec.decodeIds(input.asInstanceOf[ArrayData], symBytes, byteBase,
      unkBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = BpeCodec.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val symsRef = ctx.addReferenceObj("bpeSymBytes", symBytes, "byte[][]")
    val unkRef = ctx.addReferenceObj("bpeUnkBytes", unkBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = $helper.decodeIds($a, $symsRef, $byteBase, $unkRef);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BpeDecodeExpr =
    copy(child = newChild)

  override def prettyName: String = "bpe_decode"
}

/** word → array<string> of BPE symbols under a merge table — the
  * training loop's pair-count surface (see [[BpeCodec]]). */
case class BpeSymbolsExpr(child: Expression, ranks: BpeCodec.Ranks)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_symbols requires string input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    BpeCodec.segmentArray(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = BpeCodec.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val mapCls = classOf[java.util.HashMap[String, Integer]].getCanonicalName
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, mapCls)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (${classOf[ArrayData].getName}) $helper.segmentArray(
         |  $a, $ranksRef);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSymbolsExpr =
    copy(child = newChild)

  override def prettyName: String = "bpe_symbols"
}

object BpeFunctions {
  /** Codegen'd BPE encode: text → 1-based ids under `symbols` order,
    * `unk` for unknown symbols, `spaceId` between words. `byteBase >= 0`
    * switches unknowns to UTF-8 byte-fallback ids (zero OOV). */
  def bpeIds(text: Column, merges: Seq[(String, String)],
      symbols: Seq[String], spaceId: Int, unk: Int,
      byteBase: Int = -1): Column =
    Bridge.column(BpeIdsExpr(Bridge.expression(text),
      BpeCodec.ranksMap(merges), BpeCodec.idsMap(symbols), spaceId, unk,
      byteBase))

  /** Codegen'd byte-exact BPE decode — the inverse of [[bpeIds]]
    * (fallback byte ids reassemble multi-byte code points exactly). */
  def bpeDecode(ids: Column, symbols: Seq[String], byteBase: Int,
      unkToken: String): Column =
    Bridge.column(BpeDecodeExpr(Bridge.expression(ids),
      symbols.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .toArray,
      byteBase, unkToken))

  /** Codegen'd BPE segmentation of a single word column. */
  def bpeSymbols(word: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeSymbolsExpr(Bridge.expression(word),
      BpeCodec.ranksMap(merges)))
}

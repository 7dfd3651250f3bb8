package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Codegen'd per-row scoring of a vector column against a LITERAL
  * (driver-small, model-sized) centroid matrix — the fused replacement
  * for the `transform(sequence(0, k-1), i -> dot(vec, element_at(cents,
  * i+1)))` higher-order-function formulation used by the IVF/PQ/SemDeDup
  * assignment paths and the semantic-decontamination screen.
  *
  * Why: Catalyst higher-order functions are CodegenFallback — every row
  * paid k interpreted lambda dispatches (plus element_at indexing into a
  * k×d nested literal), and the literal matrix was pretty-printed into
  * the plan TWICE (the d_semantic_decon formatted plan was 915 kB, with
  * the optimizer walking a megabyte expression tree per planning pass).
  * This expression carries the matrix as a compact reference object
  * (flattened float[], plan prints only the shape) and scores in one
  * tight primitive loop inside whole-stage codegen.
  *
  * Bit-parity contract (law-pinned in CentroidKernelSuite, oracle-gated
  * by every consuming query): each output element reproduces the HOF
  * formulation EXACTLY —
  *  - dots accumulate left-to-right in double over float products
  *    (the [[FloatVecDot]] discipline);
  *  - a null/ragged input vector or a null element yields the same
  *    all-null-element array (never a null array — `transform` over a
  *    literal sequence is non-nullable);
  *  - cosine mode divides by `sqrt(vv*cc)` under Spark's non-ANSI
  *    division: a 0.0 divisor yields a NULL element, NaN flows through;
  *  - `roundAt >= 0` replicates Spark's `round(x, s)` HALF_UP BigDecimal
  *    rounding per element (the pruneRanked pre-ranking round).
  */
object CentroidKernel {
  /** mode selectors (kept as ints for cheap codegen dispatch) */
  final val ModeDot = 0
  /** cosine vs each centroid: dot / sqrt(vv * cc2(i)) */
  final val ModeCosine = 1
  /** PQ encode distance: cn2(i) - 2d * dot (over vec[offset, offset+d)) */
  final val ModePqDist = 2

  /** Spark `round(x, s)` for doubles: BigDecimal.valueOf HALF_UP. NaN and
    * infinities pass through (matching RoundBase's guarded behavior). */
  private def roundHalfUp(x: Double, scale: Int): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  /** True iff the vector is null, ragged for the mode's length contract,
    * or carries a null element — the cases where every per-centroid dot
    * (and thus every output element) is null. `sliced` mirrors
    * `dot(slice(vec, offset+1, d), c)`: any length >= offset+d works;
    * unsliced mirrors `dot(vec, c)`: the length must equal d exactly. */
  private def invalid(v: ArrayData, d: Int, offset: Int,
      sliced: Boolean): Boolean = {
    if (v == null) return true
    val n = v.numElements()
    if (sliced) { if (n < offset + d) return true }
    else if (n != d) return true
    // null-element scan over the range the dots read; cosine mode's vv
    // spans the whole vector but cosine is only used unsliced, where the
    // range IS the whole vector
    var i = offset
    val end = offset + d
    while (i < end) { if (v.isNullAt(i)) return true; i += 1 }
    false
  }

  /** The fused scoring loop. `flat` is the row-major k×d centroid matrix;
    * `aux` is per-centroid: cc2 (cosine) or cn2 (pq), unused for dots.
    * Returns a k-element array<double> with the null semantics above. */
  def scores(v: ArrayData, flat: Array[Float], k: Int, d: Int,
      offset: Int, sliced: Boolean, mode: Int, aux: Array[Double],
      roundAt: Int): ArrayData = {
    if (invalid(v, d, offset, sliced)) return new GenericArrayData(new Array[Any](k))
    val out = new Array[Any](k)
    var vv = 0.0
    if (mode == ModeCosine) {
      var i = 0
      while (i < d) {
        val x = v.getFloat(i).toDouble; vv += x * x; i += 1
      }
    }
    var c = 0
    while (c < k) {
      var acc = 0.0
      var i = 0
      val base = c * d
      while (i < d) {
        acc += v.getFloat(offset + i).toDouble * flat(base + i).toDouble
        i += 1
      }
      out(c) = mode match {
        case ModeDot => acc
        case ModeCosine =>
          val div = math.sqrt(vv * aux(c))
          if (div == 0.0) null
          else {
            val cos = acc / div
            if (roundAt >= 0) roundHalfUp(cos, roundAt) else cos
          }
        case _ => aux(c) - 2.0d * acc
      }
      c += 1
    }
    new GenericArrayData(out)
  }

  /** SRP bucket key: bit p iff dot(v, plane_p) > 0 under Spark's
    * NaN-greatest comparison (NaN dot sets the bit); null/ragged/
    * null-element vectors read 0L (every per-plane `when` fell through
    * to `otherwise(0L)` in the fused formulation). */
  def srpBucket(v: ArrayData, flat: Array[Float], k: Int, d: Int): Long = {
    if (invalid(v, d, 0, sliced = false)) return 0L
    var key = 0L
    var c = 0
    while (c < k) {
      var acc = 0.0
      var i = 0
      val base = c * d
      while (i < d) {
        acc += v.getFloat(i).toDouble * flat(base + i).toDouble
        i += 1
      }
      if (acc > 0.0 || java.lang.Double.isNaN(acc)) key |= (1L << c)
      c += 1
    }
    key
  }

  /** Spark's SQLOrderingUtil double comparison (NaN greatest, -0.0 == 0.0)
    * — the ordering `array_max` applies to a struct's double field. */
  private def cmpDouble(x: Double, y: Double): Int =
    if (x < y) -1 else if (x > y) 1 else if (x == y) 0
    else if (java.lang.Double.isNaN(x)) { if (java.lang.Double.isNaN(y)) 0 else 1 }
    else -1

  /** `array_max` over `struct(cosine_i, id_i)` against the matrix — the
    * semantic-decontamination best-match. Null-first field ordering: a
    * null cosine sorts below every non-null one, ties break to the larger
    * id — exactly the struct ordering the HOF formulation fed array_max. */
  def best(v: ArrayData, flat: Array[Float], k: Int, d: Int,
      aux: Array[Double], ids: Array[Long]): InternalRow = {
    val all = scores(v, flat, k, d, 0, sliced = false, ModeCosine, aux, -1)
    var bestC: Any = all.get(0, DoubleType)
    var bestB = ids(0)
    var i = 1
    while (i < k) {
      val ci = all.get(i, DoubleType)
      val take =
        if (ci == null) bestC == null && ids(i) > bestB
        else if (bestC == null) true
        else {
          val c = cmpDouble(ci.asInstanceOf[Double], bestC.asInstanceOf[Double])
          c > 0 || (c == 0 && ids(i) > bestB)
        }
      if (take) { bestC = ci; bestB = ids(i) }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestC, bestB))
  }
}

/** `array<double>` of per-centroid scores of `child` against a literal
  * matrix (see [[CentroidKernel]] for modes and the parity contract). */
case class CentroidScores(child: Expression, matrix: Array[Array[Float]],
    mode: Int, offset: Int = 0, sliced: Boolean = false, roundAt: Int = -1)
    extends UnaryExpression {
  require(matrix.nonEmpty, "CentroidScores: empty matrix")
  require(matrix.forall(_.length == matrix.head.length),
    "CentroidScores: ragged matrix")
  require(offset == 0 || sliced, "CentroidScores: offset requires sliced")

  private val k = matrix.length
  private val d = matrix.head.length
  @transient private lazy val flat: Array[Float] = {
    val f = new Array[Float](k * d)
    var c = 0
    while (c < k) { System.arraycopy(matrix(c), 0, f, c * d, d); c += 1 }
    f
  }
  /** cc2 / cn2: per-centroid self-dot, accumulated exactly as the HOF
    * sites did (left-to-right double sum over float products). */
  @transient private lazy val aux: Array[Double] =
    matrix.map { cvec =>
      var acc = 0.0; var i = 0
      while (i < cvec.length) { acc += cvec(i).toDouble * cvec(i).toDouble; i += 1 }
      acc
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  // transform(sequence(...), ...) over a literal sequence is non-nullable:
  // a null input vector yields an all-null-ELEMENT array, never null
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"centroid_scores requires array<float>, got $t")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input).asInstanceOf[ArrayData]
    CentroidKernel.scores(v, flat, k, d, offset, sliced, mode, aux, roundAt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val flatRef = ctx.addReferenceObj("cmatrix", flat, "float[]")
    val auxRef = ctx.addReferenceObj("caux", aux, "double[]")
    val childGen = child.genCode(ctx)
    val kernel = CentroidKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
    ev.copy(
      code = childGen.code +
        code"""
          |$ad ${ev.value} = $kernel.scores(
          |  ${childGen.isNull} ? null : ${childGen.value},
          |  $flatRef, $k, $d, $offset, $sliced, $mode, $auxRef, $roundAt);
          |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CentroidScores = copy(child = newChild)

  override def prettyName: String = "centroid_scores"
  // keep the matrix OUT of the plan text: print shape, not k×d floats
  override def toString: String = s"centroid_scores(${child}, k=$k, d=$d, " +
    s"mode=$mode, offset=$offset, roundAt=$roundAt)"
  override def sql: String = s"centroid_scores(${child.sql})"
}

/** Signed-random-projection bucket key: bit `p` set iff
  * `dot(vec, plane_p) > 0` under SPARK's comparison ordering (NaN sorts
  * above every double, so a NaN dot SETS its bit — parity with the
  * `when(dot > 0, 1L<<p)` formulation this fuses; a null dot — null/
  * ragged/null-element vector — leaves the bit clear via the
  * `otherwise(0L)`, so such vectors land in bucket 0 exactly as
  * before). One pass over the vector instead of `planes` separate
  * codegen'd dots each re-scanning it. */
case class SrpBucketKey(child: Expression, planes: Array[Array[Float]])
    extends UnaryExpression {
  require(planes.nonEmpty, "SrpBucketKey: empty plane family")
  require(planes.forall(_.length == planes.head.length),
    "SrpBucketKey: ragged planes")
  require(planes.length <= 63, s"SrpBucketKey: ${planes.length} planes " +
    "overflow the long bucket key")

  private val k = planes.length
  private val d = planes.head.length
  @transient private lazy val flat: Array[Float] = {
    val f = new Array[Float](k * d)
    var c = 0
    while (c < k) { System.arraycopy(planes(c), 0, f, c * d, d); c += 1 }
    f
  }

  override def dataType: DataType = LongType
  // when(...).otherwise(0L) reduced by bitwiseOR is never null
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"srp_bucket requires array<float>, got $t")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input).asInstanceOf[ArrayData]
    CentroidKernel.srpBucket(v, flat, k, d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val flatRef = ctx.addReferenceObj("planes", flat, "float[]")
    val childGen = child.genCode(ctx)
    val kernel = CentroidKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(
      code = childGen.code +
        code"""
          |long ${ev.value} = $kernel.srpBucket(
          |  ${childGen.isNull} ? null : ${childGen.value}, $flatRef, $k, $d);
          |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : SrpBucketKey = copy(child = newChild)

  override def prettyName: String = "srp_bucket"
  override def toString: String = s"srp_bucket(${child}, k=$k, d=$d)"
  override def sql: String = s"srp_bucket(${child.sql})"
}

/** `struct(c: double, b: long)` — the max of `struct(cosine_i, id_i)`
  * over the matrix (the semantic-decontamination best-eval-match; see
  * [[CentroidKernel.best]] for the exact ordering parity). */
case class BestCentroidMatch(child: Expression, ids: Array[Long],
    matrix: Array[Array[Float]]) extends UnaryExpression {
  require(matrix.nonEmpty && ids.length == matrix.length,
    "BestCentroidMatch: ids/matrix size mismatch")
  require(matrix.forall(_.length == matrix.head.length),
    "BestCentroidMatch: ragged matrix")

  private val k = matrix.length
  private val d = matrix.head.length
  @transient private lazy val flat: Array[Float] = {
    val f = new Array[Float](k * d)
    var c = 0
    while (c < k) { System.arraycopy(matrix(c), 0, f, c * d, d); c += 1 }
    f
  }
  @transient private lazy val aux: Array[Double] =
    matrix.map { cvec =>
      var acc = 0.0; var i = 0
      while (i < cvec.length) { acc += cvec(i).toDouble * cvec(i).toDouble; i += 1 }
      acc
    }

  override def dataType: DataType = StructType(Seq(
    StructField("c", DoubleType, nullable = true),
    StructField("b", LongType, nullable = false)))
  // array_max over non-null struct elements never returns null (k >= 1)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"best_centroid_match requires array<float>, got $t")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input).asInstanceOf[ArrayData]
    CentroidKernel.best(v, flat, k, d, aux, ids)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val flatRef = ctx.addReferenceObj("cmatrix", flat, "float[]")
    val auxRef = ctx.addReferenceObj("caux", aux, "double[]")
    val idsRef = ctx.addReferenceObj("cids", ids, "long[]")
    val childGen = child.genCode(ctx)
    val kernel = CentroidKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val ir = "org.apache.spark.sql.catalyst.InternalRow"
    ev.copy(
      code = childGen.code +
        code"""
          |$ir ${ev.value} = $kernel.best(
          |  ${childGen.isNull} ? null : ${childGen.value},
          |  $flatRef, $k, $d, $auxRef, $idsRef);
          |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BestCentroidMatch = copy(child = newChild)

  override def prettyName: String = "best_centroid_match"
  override def toString: String =
    s"best_centroid_match(${child}, k=$k, d=$d)"
  override def sql: String = s"best_centroid_match(${child.sql})"
}

/** Column-level entry points. */
object CentroidFunctions {
  /** dots of `vec` vs each matrix row (the nearest-centroid argmax input). */
  def centroidDots(vec: Column, matrix: Array[Array[Float]]): Column =
    Bridge.column(CentroidScores(Bridge.expression(vec), matrix,
      CentroidKernel.ModeDot))

  /** cosines of `vec` vs each matrix row; `roundAt >= 0` rounds each
    * element (Spark `round`) BEFORE any downstream max/ranking. */
  def centroidCosines(vec: Column, matrix: Array[Array[Float]],
      roundAt: Int = -1): Column =
    Bridge.column(CentroidScores(Bridge.expression(vec), matrix,
      CentroidKernel.ModeCosine, roundAt = roundAt))

  /** PQ-encode distances `cn2(i) - 2*dot(vec[offset..offset+d), row_i)`
    * — the `slice` + dot formulation fused (subspace `j` passes
    * `offset = j*dsub`). */
  def pqSubDists(vec: Column, codebook: Array[Array[Float]],
      offset: Int): Column =
    Bridge.column(CentroidScores(Bridge.expression(vec), codebook,
      CentroidKernel.ModePqDist, offset = offset, sliced = true))

  /** subspace dot table for ADC: dots of `vec[offset..offset+d)` vs each
    * codebook row. */
  def pqSubDots(vec: Column, codebook: Array[Array[Float]],
      offset: Int): Column =
    Bridge.column(CentroidScores(Bridge.expression(vec), codebook,
      CentroidKernel.ModeDot, offset = offset, sliced = true))

  /** best `(cosine, id)` eval match (semantic decontamination). */
  def bestCentroidMatch(vec: Column, ids: Array[Long],
      matrix: Array[Array[Float]]): Column =
    Bridge.column(BestCentroidMatch(Bridge.expression(vec), ids, matrix))

  /** fused SRP bucket key over a literal hyperplane family. */
  def srpBucketKey(vec: Column, planes: Array[Array[Float]]): Column =
    Bridge.column(SrpBucketKey(Bridge.expression(vec), planes))
}

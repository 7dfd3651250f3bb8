package graft

import graft.functions.CentroidFunctions
import graft.functions.VecFunctions.vecDot
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parity laws for the fused centroid-scoring kernel (CentroidScores /
  * BestCentroidMatch): each mode must be BIT-IDENTICAL to the
  * higher-order-function formulation it replaced (transform over a
  * literal sequence with per-element vec_dot / element_at), on the full
  * adversarial input domain — null vectors, ragged lengths, null
  * elements, zero vectors, NaN elements, exact ties. The HOF twin is
  * rebuilt here verbatim from the pre-optimization operators. */
class CentroidKernelSuite extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(4242)
  private val dims = 8

  private def mat(k: Int): Array[Array[Float]] =
    Array.fill(k)(Array.fill(dims)((rng.nextFloat() - 0.5f) * 2f))

  /** adversarial vector pool: valid, null, short, long, null-element,
    * zero, NaN-element, and exact copies of centroids (tie bait). */
  private def vecPool(m: Array[Array[Float]]): Seq[Seq[java.lang.Float]] = {
    def f(x: Float): java.lang.Float = java.lang.Float.valueOf(x)
    val valid = Seq.fill(40)(Seq.fill(dims)(f((rng.nextFloat() - 0.5f) * 3f)))
    val copies = m.take(3).map(_.map(f).toSeq).toSeq
    val scaled = m.take(2).map(_.map(x => f(x * 2.5f)).toSeq).toSeq
    valid ++ copies ++ scaled ++ Seq(
      null,
      Seq.fill(dims - 1)(f(1f)),
      Seq.fill(dims + 2)(f(1f)),
      Seq.fill(dims)(f(0f)),
      (Seq.fill(dims - 1)(f(1f)) :+ null.asInstanceOf[java.lang.Float]),
      (Seq.fill(dims - 1)(f(1f)) :+ f(Float.NaN)))
  }

  private def df(m: Array[Array[Float]]) =
    vecPool(m).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))

  /** bit-parity compare: stringified element lists distinguish null vs
    * 0.0, -0.0 vs 0.0, and treat NaN == NaN (Seq equality would not). */
  private def collectBoth(newCol: Column, oldCol: Column,
      m: Array[Array[Float]]): Unit = {
    val rows = df(m).select(newCol.as("nw"), oldCol.as("od")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      val nw = Option(r.getSeq[Any](0)).map(_.map(String.valueOf).toList)
      val od = Option(r.getSeq[Any](1)).map(_.map(String.valueOf).toList)
      assert(nw == od, s"row $i: new=$nw old=$od")
    }
  }

  test("dot mode == HOF transform/vec_dot, unsliced") {
    val m = mat(5)
    val cents = typedlit(m.map(_.toSeq).toSeq)
    val oldCol = transform(sequence(lit(0), lit(m.length - 1)),
      i => vecDot(col("v"), element_at(cents, i + lit(1))))
    collectBoth(CentroidFunctions.centroidDots(col("v"), m), oldCol, m)
  }

  test("dot mode == HOF over slice (pq ADC table shape)") {
    val k = 4
    val sub = Array.fill(k)(Array.fill(4)((rng.nextFloat() - 0.5f) * 2f))
    val oldCol = {
      val cents = typedlit(sub.map(_.toSeq).toSeq)
      transform(sequence(lit(0), lit(k - 1)),
        i => vecDot(slice(col("v"), 5, 4), element_at(cents, i + lit(1))))
    }
    collectBoth(CentroidFunctions.pqSubDots(col("v"), sub, 4), oldCol, mat(2))
  }

  test("pq-dist mode == HOF cn2 - 2*dot over slice") {
    val k = 6
    val sub = Array.fill(k)(Array.fill(4)((rng.nextFloat() - 0.5f) * 2f))
    val cn2 = typedlit(sub.map(c => c.map(x => x.toDouble * x).sum).toSeq)
    val cb = typedlit(sub.map(_.toSeq).toSeq)
    val oldCol = transform(sequence(lit(0), lit(k - 1)),
      c => element_at(cn2, c + 1) -
        lit(2d) * vecDot(slice(col("v"), 5, 4), element_at(cb, c + 1)))
    collectBoth(CentroidFunctions.pqSubDists(col("v"), sub, 4), oldCol, mat(2))
  }

  test("cosine mode == HOF dot/sqrt(vv*cc), incl. zero-divisor -> null") {
    val m = mat(7)
    val cents = typedlit(m.map(_.toSeq).toSeq)
    val v = col("v")
    val oldCol = transform(sequence(lit(0), lit(m.length - 1)), i => {
      val c = element_at(cents, i + lit(1))
      vecDot(v, c) / sqrt(vecDot(v, v) * vecDot(c, c))
    })
    collectBoth(CentroidFunctions.centroidCosines(v, m), oldCol, m)
  }

  test("cosine mode roundAt=4 == HOF round(cos, 4) per element") {
    val m = mat(7)
    val cents = typedlit(m.map(_.toSeq).toSeq)
    val v = col("v")
    val oldCol = transform(sequence(lit(0), lit(m.length - 1)), i => {
      val c = element_at(cents, i + lit(1))
      round(vecDot(v, c) / sqrt(vecDot(v, v) * vecDot(c, c)), 4)
    })
    collectBoth(CentroidFunctions.centroidCosines(v, m, roundAt = 4),
      oldCol, m)
  }

  test("best match == HOF array_max over struct(cos, id), incl. ties") {
    val m = mat(6)
    // duplicate one centroid so two ids share an exact cosine: the max
    // must break to the LARGER id (the decon contract)
    m(3) = m(1).clone()
    val ids = Array(10L, 20L, 30L, 40L, 50L, 60L)
    val cents = typedlit(m.map(_.toSeq).toSeq)
    val idsL = typedlit(ids.toSeq)
    val v = col("v")
    val oldCol = array_max(transform(sequence(lit(0), lit(ids.length - 1)),
      i => {
        val c = element_at(cents, i + lit(1))
        struct(
          (vecDot(v, c) / sqrt(vecDot(v, v) * vecDot(c, c))).as("c"),
          element_at(idsL, i + lit(1)).as("b"))
      }))
    val rows = df(m).select(
      CentroidFunctions.bestCentroidMatch(v, ids, m).as("nw"),
      oldCol.as("od")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      val nw = r.getStruct(0)
      val od = r.getStruct(1)
      assert((nw == null) == (od == null), s"row $i null mismatch")
      if (nw != null) {
        // stringified compare: NaN == NaN, null != 0.0, -0.0 != 0.0
        assert(String.valueOf(nw.get(0)) == String.valueOf(od.get(0)),
          s"row $i cos: $nw vs $od")
        assert(nw.get(1) == od.get(1), s"row $i id: $nw vs $od")
      }
    }
  }

  test("srp bucket key == HOF when(dot > 0, 1L<<p) bitwiseOR reduce") {
    val planes = Array.fill(7)(Array.fill(dims)(
      if (rng.nextBoolean()) 1f else -1f))
    val oldCol = (0 until planes.length).map { p =>
      when(vecDot(col("v"), typedlit(planes(p).toSeq)) > 0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    val rows = df(mat(2)).select(
      CentroidFunctions.srpBucketKey(col("v"), planes).as("nw"),
      oldCol.as("od")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == r.getLong(1),
        s"row $i: ${r.getLong(0)} vs ${r.getLong(1)}") }
  }

  test("argmax downstream (nearest centroid) matches across 100 random rows") {
    val m = mat(9)
    val cents = typedlit(m.map(_.toSeq).toSeq)
    val oldDots = transform(sequence(lit(0), lit(m.length - 1)),
      i => vecDot(col("v"), element_at(cents, i + lit(1))))
    val newDots = CentroidFunctions.centroidDots(col("v"), m)
    val rows = df(m).select(
      (array_position(newDots, array_max(newDots)) - 1).cast("int").as("nb"),
      (array_position(oldDots, array_max(oldDots)) - 1).cast("int").as("ob"))
      .collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.get(0) == r.get(1), s"row $i: ${r.get(0)} vs ${r.get(1)}") }
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve values for multi-dimensional file clustering —
  * the real interleaved curve behind `OPTIMIZE ZORDER BY` (delta's
  * `interleave_bits` design: normalize each column to a fixed-width
  * bucket id, interleave the bits, range-partition on the result).
  * Replaces the earlier lexicographic `repartitionByRange(cols)`
  * approximation, which clusters well on the FIRST column only; the
  * curve keeps points close in ALL dimensions in the same file, so
  * min/max file skipping prunes on any z-ordered column.
  *
  * Everything is plain `Column` arithmetic (shift/and/or) — whole-stage
  * codegen, no UDF; the only driver work is one min/max aggregate per
  * call to fix the bucket ranges.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each column (already bucketized to
    * `[0, 2^bits)`): column i's bit b lands at position `b * n + i`. */
  def interleaveBits(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits * cols.size <= 63,
      s"${cols.size} columns * $bits bits exceeds a long")
    val n = cols.size
    cols.zipWithIndex.map { case (c, ci) =>
      (0 until bits).map { b =>
        shiftleft(shiftrightunsigned(c, b).bitwiseAND(lit(1L)), b * n + ci)
      }.reduce((a, b) => a.bitwiseOR(b))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Z-value over `cols` of `df`: each column is cast to double,
    * normalized over its global [min, max] (one driver-side aggregate),
    * equi-width bucketized to `bits` bits, then bit-interleaved. Nulls
    * bucket to 0. `bits` auto-caps so the z-value fits a long. */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    val b = math.min(bits, 63 / cols.size)
    val maxBucket = (1L << b) - 1
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      val (mn, mx) =
        (if (row.isNullAt(2 * i)) 0d else row.getDouble(2 * i),
         if (row.isNullAt(2 * i + 1)) 0d else row.getDouble(2 * i + 1))
      val scale = if (mx > mn) maxBucket / (mx - mn) else 0d
      least(lit(maxBucket), greatest(lit(0L),
        floor((coalesce(col(c).cast("double"), lit(mn)) - lit(mn)) * lit(scale))
          .cast("long")))
    }
    interleaveBits(buckets, b)
  }

  /** `df` rewritten along the curve: range-partitioned into `numFiles`
    * z-ranges and sorted by z within each — one shuffle, then each output
    * file covers a compact hyper-rectangle of the key space. */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 16): DataFrame = {
    val zc = "__z"
    df.withColumn(zc, zValue(df, cols, bits))
      .repartitionByRange(numFiles, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
  }
}

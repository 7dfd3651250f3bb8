package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** ANALYZE-style data profiling — the first thing run against any new
  * source before it enters a pipeline: per column, row/null counts,
  * distinct cardinality, lexical min/max of the string form, and mean
  * string length. One long-format row per column so the report is
  * stable as schemas evolve (a wide one-row layout re-shapes on every
  * added column).
  *
  * All in ONE aggregation pass: every per-column statistic is an
  * aggregate expression over the same scan, reduced map-side, and the
  * single result row unpivots to long format with `stack` (no second
  * scan, no per-column job). Nested columns (array/map/struct) profile
  * their null/row counts but skip distinct/min/max/len — their string
  * forms are not cross-engine portable.
  *
  * Exact-vs-approx is the scale dial: `exactNdv = true` uses
  * `count(distinct c)`, which Spark plans as ONE pass with an Expand
  * fan-out of (#distinct-columns + 1) — fine for profiling runs, but
  * at 100 TB that multiplies the shuffle by the column count, so
  * `exactNdv = false` swaps in `approx_count_distinct` (HyperLogLog++,
  * mergeable, no Expand — the whole profile stays one narrow pass).
  * The report is oracle-checkable only in exact mode.
  *
  * Determinism: counts are exact longs; min/max compare the CAST(c AS
  * STRING) form lexically (integers and strings render identically in
  * ANSI engines — floats do NOT, so float columns should be profiled
  * with `exactNdv` counts only or pre-cast to decimal by the caller);
  * `avg_len` divides two exact longs once. */
object Profile {

  def tableProfile(df: DataFrame, exactNdv: Boolean = true): DataFrame = {
    require(df.schema.nonEmpty, "tableProfile: empty schema")
    val fields = df.schema.fields
    val aggs = fields.zipWithIndex.flatMap { case (f, i) =>
      val c = col(f.name)
      val nested = f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] || f.dataType.isInstanceOf[StructType]
      val s = c.cast("string")
      Seq(
        count(c).as(s"__nn$i"),
        (if (nested) lit(null).cast("long")
         else if (exactNdv) countDistinct(c)
         else approx_count_distinct(c)).as(s"__nd$i"),
        (if (nested) lit(null).cast("string") else min(s)).as(s"__mn$i"),
        (if (nested) lit(null).cast("string") else max(s)).as(s"__mx$i"),
        (if (nested) lit(null).cast("long")
         else sum(length(s).cast("long"))).as(s"__sl$i"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = fields.zipWithIndex
      .map { case (f, i) =>
        s"'${f.name}', __nn$i, __nd$i, __mn$i, __mx$i, __sl$i"
      }
      .mkString(", ")
    one
      .select(col("__n"), expr(
        s"stack(${fields.length}, $stackArgs) AS " +
          "(column_name, __nn, n_distinct, min_s, max_s, __sl)"))
      .select(col("column_name"), col("__n").as("n_rows"),
        (col("__n") - col("__nn")).as("n_null"), col("n_distinct"),
        col("min_s"), col("max_s"),
        when(col("__nn") > 0L,
          round(col("__sl").cast("double") / col("__nn"), 4))
          .otherwise(lit(0d)).as("avg_len"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: for every left row, the single most recent right row whose
  * time is at or before the left row's time, per key — the time-series /
  * feature-store join (match each event to the latest state known at its
  * time) that Spark has no native operator for.
  *
  * Execution is ONE shuffle, no range self-join and no per-row probe:
  * both sides union into a single frame tagged by origin, hash-partitioned
  * by key and sorted by (time, tag) — right rows sort BEFORE left rows at
  * equal time, so ties match (`right.t <= left.t`, DuckDB ASOF JOIN
  * semantics) — and a running `last(_, ignoreNulls)` window carries each
  * right column forward onto the left rows that follow. Cost is a single
  * sort-based window over (keys, time): the shape that survives a 100×
  * scale-up, unlike the O(L·R)-prone range-condition join Catalyst would
  * otherwise plan.
  *
  * Left rows with no preceding right row keep NULL in the joined columns
  * (ASOF LEFT JOIN); filter them for inner semantics. If the right side
  * can carry duplicate (keys, time) rows, dedup it first — "the latest
  * row at time t" is otherwise ambiguous in any engine.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must name at least one column to join")
    val lSide = rightCols.foldLeft(
      left.withColumn("__t", col(leftTime)).withColumn("__tag", lit(1))) {
      (df, c) => df.withColumn(s"$prefix$c", lit(null).cast(right.schema(c).dataType))
    }
    val rBase = right.select(
      (keys.map(col) :+ col(rightTime).as("__t")) ++
        rightCols.map(c => col(c).as(s"$prefix$c")): _*)
      .withColumn("__tag", lit(0))
    val leftOnlyCols = left.columns.filterNot(keys.contains)
    val rSide = leftOnlyCols.foldLeft(rBase)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lSide.unionByName(rSide.select(lSide.columns.map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightCols.foldLeft(unioned)((df, c) =>
      df.withColumn(s"$prefix$c", last(col(s"$prefix$c"), ignoreNulls = true).over(w)))
    filled.filter(col("__tag") === 1).drop("__t", "__tag")
  }

  /** Inner-variant convenience: drops left rows with no as-of match
    * (tested on the first joined column). */
  def asofJoinInner(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightCols: Seq[String], prefix: String = "asof_"): DataFrame =
    asofJoin(left, right, keys, leftTime, rightTime, rightCols, prefix)
      .filter(col(s"$prefix${rightCols.head}").isNotNull)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** AS-OF join: for every left row, the single most recent right row whose
  * time is at or before the left row's time, per key — the time-series /
  * feature-store join (match each event to the latest state known at its
  * time) that Spark has no native operator for.
  *
  * Execution is ONE shuffle, no range self-join and no per-row probe:
  * both sides union into a single frame tagged by origin, hash-partitioned
  * by key and sorted by (time, tag) — right rows sort BEFORE left rows at
  * equal time, so ties match (`right.t <= left.t`, DuckDB ASOF JOIN
  * semantics) — and a running `last(_, ignoreNulls)` window carries the
  * right row forward onto the left rows that follow. The joined columns
  * travel as ONE struct so the carry is row-atomic: a NULL in one right
  * column never splices in an older row's value for that column while
  * other columns take the newer row's (the ASOF match is a row, not a set
  * of independent columns). Right rows with a NULL time are dropped before
  * the union — `right.t <= left.t` never matches NULL. Cost is a single
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

  /** The filled union frame, before unpacking: left rows carry the matched
    * right row (or NULL for no match) in the `__r` struct column. */
  private def filledFrame(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightCols: Seq[String]): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must name at least one column to join")
    val rStruct = StructType(rightCols.map(c => right.schema(c).copy(nullable = true)))
    val lSide = left.withColumn("__t", col(leftTime)).withColumn("__tag", lit(1))
      .withColumn("__r", lit(null).cast(rStruct))
    val rBase = right.filter(col(rightTime).isNotNull).select(
      (keys.map(col) :+ col(rightTime).as("__t")) :+
        struct(rightCols.map(col): _*).as("__r"): _*)
      .withColumn("__tag", lit(0))
    val leftOnlyCols = left.columns.filterNot(keys.contains)
    val rSide = leftOnlyCols.foldLeft(rBase)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lSide.unionByName(rSide.select(lSide.columns.map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned.withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
  }

  private def unpack(filled: DataFrame, rightCols: Seq[String],
      prefix: String): DataFrame =
    rightCols.foldLeft(filled)((df, c) =>
      df.withColumn(s"$prefix$c", col("__r").getField(c)))
      .drop("__t", "__tag", "__r")

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightCols: Seq[String], prefix: String = "asof_"): DataFrame =
    unpack(filledFrame(left, right, keys, leftTime, rightTime, rightCols),
      rightCols, prefix)

  /** Inner-variant convenience: drops left rows with no as-of match (the
    * carried right-row struct itself is NULL — a matched row whose columns
    * happen to be NULL still counts as a match, as in any inner join). */
  def asofJoinInner(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightCols: Seq[String], prefix: String = "asof_"): DataFrame =
    unpack(filledFrame(left, right, keys, leftTime, rightTime, rightCols)
      .filter(col("__r").isNotNull), rightCols, prefix)
}

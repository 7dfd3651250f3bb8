package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time normalization across testdata generations.
  *
  * The driver's `events.ts` has shipped under two physical parquet types:
  * TIMESTAMP(NANOS) — which Spark reads as nano-epoch LongType under
  * `spark.sql.legacy.parquet.nanosAsLong` — and TIMESTAMP_MICROS with
  * isAdjustedToUTC=false, which Spark reads as TimestampNTZ. Every
  * consumer dispatches on the READ dtype here instead of assuming one
  * physical schema; an unexpected dtype fails loudly with the column
  * named (SCHEMA-ASSUMPTION: events.ts physical type — this object is
  * the single place that knows the legal set). The engine session pins
  * the timezone to UTC, so the NTZ -> TimestampType casts below are
  * value-identities.
  */
object EventTime {

  /** The column as a session-TZ TimestampType at exact microsecond
    * precision. Nano-epoch longs use integral `div` — `/` on longs is
    * double division in Spark, and doubles cannot represent nano-epoch
    * values exactly (off-by-one microseconds vs an exact oracle). */
  def asTimestamp(df: DataFrame, c: String = "ts"): Column =
    df.schema(c).dataType match {
      case LongType         => timestamp_micros(expr(s"$c div 1000"))
      case TimestampNTZType => col(c).cast(TimestampType)
      case TimestampType    => col(c)
      case other            => unsupported(c, other)
    }

  /** The column as epoch-microseconds BIGINT (exact at µs on every
    * supported physical type). */
  def asEpochMicros(df: DataFrame, c: String = "ts"): Column =
    df.schema(c).dataType match {
      case LongType         => expr(s"$c div 1000")
      case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
      case TimestampType    => unix_micros(col(c))
      case other            => unsupported(c, other)
    }

  /** True iff the column arrived as a nano-epoch long (the legacy
    * TIMESTAMP(NANOS) generation) — for callers that want full-nano
    * precision on that path instead of the µs normalization. */
  def isNanoLong(df: DataFrame, c: String = "ts"): Boolean =
    df.schema(c).dataType == LongType

  private def unsupported(c: String, t: DataType): Nothing =
    throw new IllegalStateException(
      s"event-time column '$c': unsupported dtype $t — expected nano-epoch " +
        "LONG (parquet TIMESTAMP(NANOS) under nanosAsLong), TIMESTAMP_NTZ " +
        "(parquet TIMESTAMP_MICROS isAdjustedToUTC=false), or TIMESTAMP")
}

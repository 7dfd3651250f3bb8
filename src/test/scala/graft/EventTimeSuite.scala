package graft

import graft.util.EventTime
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events.ts dtype dispatch (round-11 regression: the testdata
  * generator switched events.ts from TIMESTAMP(NANOS) — nano-epoch long
  * under nanosAsLong — to TIMESTAMP_MICROS NTZ, and every timestamp query
  * silently vanished from correctness). Pins all three supported read
  * dtypes and the loud failure on anything else. */
class EventTimeSuite extends SparkSpec {
  import spark.implicits._

  // 2021-01-01T00:00:00.123456Z in epoch units
  private val baseUs = 1609459200L * 1000000L + 123456L

  test("nano-epoch long column: exact integral µs conversion") {
    val df = Seq(baseUs * 1000L + 789L).toDF("ts") // sub-µs nanos truncate
    assert(df.schema("ts").dataType == LongType)
    val out = df.select(
      unix_micros(EventTime.asTimestamp(df)).as("t"),
      EventTime.asEpochMicros(df).as("us")).head()
    assert(out.getLong(0) == baseUs)
    assert(out.getLong(1) == baseUs)
    assert(EventTime.isNanoLong(df))
  }

  test("nano-epoch long: div (integral) not / (double) — exactness at full range") {
    // a nano epoch that double cannot represent exactly: the double
    // round-trip drifts, integral div must not
    val nanos = 1609459200123456789L
    val df = Seq(nanos).toDF("ts")
    assert(df.select(EventTime.asEpochMicros(df)).head().getLong(0)
      == nanos / 1000L)
  }

  test("TIMESTAMP_NTZ column: value-identity under the UTC session") {
    val df = Seq("2021-01-01 00:00:00.123456").toDF("raw")
      .select(to_timestamp_ntz(col("raw")).as("ts"))
    assert(df.schema("ts").dataType == TimestampNTZType)
    val out = df.select(
      unix_micros(EventTime.asTimestamp(df)).as("t"),
      EventTime.asEpochMicros(df).as("us")).head()
    assert(out.getLong(0) == baseUs)
    assert(out.getLong(1) == baseUs)
    assert(!EventTime.isNanoLong(df))
  }

  test("TIMESTAMP column: passthrough") {
    val df = Seq("2021-01-01 00:00:00.123456").toDF("raw")
      .select(to_timestamp(col("raw")).as("ts"))
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(EventTime.asEpochMicros(df)).head().getLong(0) == baseUs)
  }

  test("unsupported dtype fails loudly, naming the column") {
    val df = Seq("oops").toDF("ts")
    val e = intercept[IllegalStateException](EventTime.asTimestamp(df))
    assert(e.getMessage.contains("'ts'") && e.getMessage.contains("StringType"))
  }

  test("real events table reads through the dispatch (whatever generation)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val e = spark.read.parquet(s"$dir/events.parquet")
    val n = e.count()
    val ok = e.select(EventTime.asTimestamp(e).as("t"),
        EventTime.asEpochMicros(e).as("us"))
      .filter(unix_micros(col("t")) === col("us"))
      .count()
    assert(ok == n, "asTimestamp and asEpochMicros must agree row-for-row")
  }
}

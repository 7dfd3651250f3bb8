package graft.delta

import graft.core.GraftError
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Delta column mapping (reader v2 / `columnMapping` feature) resolution,
  * shared by the batch reader ([[DeltaWriter]]) and the streaming source
  * ([[graft.sources.DeltaSource]]): `columnMapping.mode` name/id tables
  * store data under physical `col-<uuid>` names, with the logical name
  * only in the schemaString's per-field metadata. Reading such files
  * without resolving the mapping surfaces physical names — silently wrong
  * columns — so every scan path must come through here.
  *
  * Flat schemas only: a nested mapped field or a mapped partitioned
  * layout (partition dirs use physical names) is refused rather than
  * misread.
  */
object ColumnMapping {

  val PhysicalNameKey = "delta.columnMapping.physicalName"

  def isMapped(schema: StructType): Boolean =
    schema.fields.exists(_.metadata.contains(PhysicalNameKey))

  private def physName(f: StructField): String =
    if (f.metadata.contains(PhysicalNameKey))
      f.metadata.getString(PhysicalNameKey) else f.name

  /** Any field whose TYPE contains a mapped nested field (the flat-only
    * support line: both read and write refuse these). */
  def hasNestedMapping(schema: StructType): Boolean =
    schema.fields.exists(f => nestedMapped(f.dataType))

  /** logical name -> physical name for every top-level field (identity
    * for unmapped fields) — the translation stats skipping needs, since
    * file stats key on the PHYSICAL names. */
  def physicalNames(schema: StructType): Map[String, String] =
    schema.fields.map(f => f.name -> physName(f)).toMap

  /** Rename `df` (aligned to the LOGICAL `schema`, same order) to the
    * physical column names for a data-file write: delta-spark's
    * columnMapping.mode=name write shape — the parquet files carry
    * `col-<uuid>` names and only the metaData schema knows the logical
    * ones. */
  def toPhysical(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.toSeq.map(f => col(s"`${f.name}`").as(physName(f))): _*)

  private def nestedMapped(dt: DataType): Boolean = dt match {
    case st: StructType => st.fields.exists(f =>
      f.metadata.contains(PhysicalNameKey) || nestedMapped(f.dataType))
    case ArrayType(et, _) => nestedMapped(et)
    case MapType(k, v, _) => nestedMapped(k) || nestedMapped(v)
    case _ => false
  }

  /** Scan `files` with the physical schema and project back to logical
    * names. `partitioned` = any file lives under a `col=value` dir. */
  def readMapped(spark: SparkSession, files: Seq[String], declared: StructType,
      partitioned: Boolean): DataFrame = {
    if (declared.fields.exists(f => nestedMapped(f.dataType)))
      throw new GraftError(
        "column-mapped NESTED schemas are not supported; refusing to read " +
        "rather than resolve nested fields wrong")
    if (partitioned)
      throw new GraftError(
        "column-mapped partitioned tables are not supported (partition dirs " +
        "use physical names); refusing to read rather than misattribute")
    val physSchema = StructType(declared.fields.map(f =>
      StructField(physName(f), f.dataType, f.nullable)))
    spark.read.schema(physSchema).parquet(files: _*)
      .select(declared.fields.toSeq.map(f => col(s"`${physName(f)}`").as(f.name)): _*)
  }
}

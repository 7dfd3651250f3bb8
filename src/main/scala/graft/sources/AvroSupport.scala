package graft.sources

import graft.core.UnsupportedFormatError
import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericEnumSymbol, GenericFixed, GenericRecord}
import org.apache.avro.mapred.{AvroKey, FsInput}
import org.apache.avro.mapreduce.AvroKeyInputFormat
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

/** Avro batch reads without spark-avro.
  *
  * This classpath has no spark-avro DataSource (so
  * `spark.read.format("avro")` cannot resolve), but Spark itself ships
  * avro core + avro-mapred — enough for a distributed read: the writer
  * schema comes off the first file's header (driver-side, via avro's own
  * `FsInput`), each planned file is scanned by executors through
  * `AvroKeyInputFormat` (splittable, the same input format spark-avro
  * wraps), and records convert to `Row`s inside the scan stage (avro
  * reuses record objects per reader — conversion must happen before the
  * iterator advances, and does).
  *
  * Supported schema subset (reference reads avro at
  * `src/polars_incremental/sources/file.py:150-161`): primitives, string,
  * enum (as string), bytes/fixed (as binary), `[null, T]` unions (as
  * nullable T), arrays, string-keyed maps, nested records. Multi-branch
  * unions and logical-type reinterpretation (decimal/timestamp semantics
  * ride through as their base type) are rejected or passed through,
  * never silently mangled.
  */
object AvroSupport {

  /** Classpath probe: Left(diagnostic) when the avro machinery is absent
    * (embedded in the UnsupportedFormatError so the error names the
    * missing jar, not just the format). */
  lazy val probe: Either[String, Unit] =
    try {
      Class.forName("org.apache.avro.mapreduce.AvroKeyInputFormat")
      Class.forName("org.apache.avro.generic.GenericRecord")
      Right(())
    } catch {
      case e: Throwable => Left(s"${e.getClass.getName}: ${e.getMessage}")
    }

  def isAvailable: Boolean = probe.isRight

  /** Avro schema → Spark type for the supported subset. */
  def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.ENUM => StringType
    case Schema.Type.BYTES => BinaryType
    case Schema.Type.FIXED => BinaryType
    case Schema.Type.ARRAY => ArrayType(sparkType(s.getElementType))
    case Schema.Type.MAP => MapType(StringType, sparkType(s.getValueType))
    case Schema.Type.RECORD => StructType(s.getFields.asScala.toSeq.map(f =>
      StructField(f.name, sparkType(f.schema), nullable = true)))
    case Schema.Type.UNION =>
      nonNullBranch(s).map(sparkType).getOrElse(
        throw new UnsupportedFormatError(
          s"avro union with multiple non-null branches is not supported: $s"))
    case Schema.Type.NULL => NullType
    case other =>
      throw new UnsupportedFormatError(s"avro type $other is not supported")
  }

  private def nonNullBranch(union: Schema): Option[Schema] = {
    val branches = union.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
    if (branches.size == 1) Some(branches.head) else None
  }

  /** One avro value → the Spark-external value `createDataFrame` expects.
    * Copies everything (avro reuses buffers and record objects). */
  private def convert(v: Any, s: Schema): Any = {
    if (v == null) return null
    s.getType match {
      case Schema.Type.UNION =>
        convert(v, nonNullBranch(s).getOrElse(
          throw new UnsupportedFormatError(s"unsupported avro union: $s")))
      case Schema.Type.RECORD =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(s.getFields.asScala.toSeq.map(f =>
          convert(rec.get(f.pos), f.schema)))
      case Schema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[_]].asScala.toSeq
          .map(convert(_, s.getElementType))
      case Schema.Type.MAP =>
        v.asInstanceOf[java.util.Map[_, _]].asScala.map { case (k, mv) =>
          k.toString -> convert(mv, s.getValueType)
        }.toMap
      case Schema.Type.STRING => v.toString
      case Schema.Type.ENUM => v.asInstanceOf[GenericEnumSymbol[_]].toString
      case Schema.Type.BYTES =>
        val bb = v.asInstanceOf[ByteBuffer]
        val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
      case Schema.Type.FIXED => v.asInstanceOf[GenericFixed].bytes().clone()
      case _ => v // boolean/int/long/float/double pass through
    }
  }

  /** Writer schema off one file's header (driver-side; avro headers are a
    * few KB regardless of file size). */
  def readSchema(path: Path, conf: Configuration): Schema = {
    val in = new FsInput(path, conf)
    val reader = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
    try reader.getSchema
    finally reader.close() // closes the FsInput too
  }

  /** Distributed read of `paths` (all sharing the first file's schema —
    * the batch came from one source dir; schema drift across files within
    * a batch resolves by avro's own reader-schema rules). */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    probe.left.foreach(diag => throw new UnsupportedFormatError(
      s"avro is not readable on this classpath: $diag"))
    val hconf = spark.sparkContext.hadoopConfiguration
    val avroSchema = readSchema(new Path(paths.head), hconf)
    if (avroSchema.getType != Schema.Type.RECORD)
      throw new UnsupportedFormatError(
        s"top-level avro schema must be a record, got ${avroSchema.getType}")
    val structType = sparkType(avroSchema).asInstanceOf[StructType]
    val schemaJson = avroSchema.toString // Schema isn't Serializable; ship JSON
    val rdd = spark.sparkContext.newAPIHadoopFile(
      paths.mkString(","),
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      hconf)
    val rows = rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      it.map { case (k, _) => convert(k.datum(), schema).asInstanceOf[Row] }
    }
    spark.createDataFrame(rows, structType)
  }
}

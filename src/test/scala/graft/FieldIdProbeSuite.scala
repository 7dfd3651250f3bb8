package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The fieldId read conf (`spark.sql.parquet.fieldId.read.enabled`) is the
  * gate for reading columnMapping.mode=id Delta tables by parquet field id.
  * Probed empirically (this suite pins the results):
  *
  *  1. Spark IGNORES the key as a per-read DataFrameReader option — only
  *     the session conf works. That is why GraftSession enables it as a
  *     session default instead of ColumnMapping latching it mid-read; if
  *     a future Spark honors the reader-local option, test 1 FAILS and
  *     the conf should move to a per-read option in
  *     `ColumnMapping.readMapped`.
  *  2. The session-wide enable cannot change name-mode reads: only
  *     request schemas CARRYING `parquet.field.id` metadata resolve by
  *     id; a plain schema still matches by name, even against id-bearing
  *     files.
  */
class FieldIdProbeSuite extends SparkSpec {

  private val fileSchema = StructType(Seq(
    StructField("phys_a", IntegerType, true,
      new MetadataBuilder().putLong("parquet.field.id", 7L).build()),
    StructField("phys_b", StringType, true,
      new MetadataBuilder().putLong("parquet.field.id", 8L).build())))

  private def writeIdFile(dir: String): Unit = {
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.createDataFrame(
      java.util.List.of(Row(42, "x"): Row), fileSchema)
      .write.mode("overwrite").parquet(dir)
  }

  private def withReadConf[T](value: Option[String])(f: => T): T = {
    val key = "spark.sql.parquet.fieldId.read.enabled"
    val prior = spark.conf.getOption(key)
    try { value.foreach(spark.conf.set(key, _)); if (value.isEmpty) spark.conf.unset(key); f }
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("reader-local option is ignored: only the session conf enables id resolution") {
    withTmpDir { tmp =>
      writeIdFile(s"$tmp/t")
      // request schema asks for a DIFFERENT name with the same id
      val byId = StructType(Seq(StructField("logical_x", IntegerType, true,
        new MetadataBuilder().putLong("parquet.field.id", 7L).build())))
      withReadConf(Some("false")) {
        // name mismatch + id lookup disabled -> null column, both with
        // and without the reader-local option (Spark ignores it)
        assert(spark.read.schema(byId).parquet(s"$tmp/t").head().isNullAt(0))
        assert(spark.read
          .option("spark.sql.parquet.fieldId.read.enabled", "true")
          .schema(byId).parquet(s"$tmp/t").head().isNullAt(0),
          "Spark now honors the per-read option — scope the conf in " +
          "ColumnMapping.readMapped instead of GraftSession")
      }
      withReadConf(Some("true")) {
        assert(spark.read.schema(byId).parquet(s"$tmp/t").head().getInt(0) == 42)
      }
    }
  }

  test("session-wide enable leaves name-mode reads untouched") {
    withTmpDir { tmp =>
      writeIdFile(s"$tmp/t")
      // GraftSession sessions run with the conf ON; a request schema
      // WITHOUT id metadata must still match by physical name
      withReadConf(Some("true")) {
        val byName = StructType(Seq(
          StructField("phys_b", StringType), StructField("phys_a", IntegerType)))
        val r = spark.read.schema(byName).parquet(s"$tmp/t").head()
        assert(r.getString(0) == "x" && r.getInt(1) == 42)
        // and a plain id-less file reads as ever
        spark.range(3).toDF("id").write.mode("overwrite").parquet(s"$tmp/plain")
        assert(spark.read.parquet(s"$tmp/plain").count() == 3)
      }
    }
  }
}

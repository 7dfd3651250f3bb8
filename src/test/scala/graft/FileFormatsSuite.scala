package graft

import graft.core.{BatchInfo, FileEntry, UnsupportedFormatError}
import graft.sources._
import graft.util.Jsons
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths, StandardOpenOption}

class FileFormatsSuite extends SparkSpec {

  private def write(dir: String, name: String, content: String): String = {
    val p = Paths.get(dir, name)
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes, StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING)
    p.toString
  }

  private def batchOf(paths: String*): BatchInfo =
    BatchInfo(0L, paths.map(p => FileEntry(p, 0, 0)), Jsons.obj())

  private def source(in: String, fmt: String, schema: Option[StructType] = None) =
    new FileSource(in, new FileStreamCheckpoint(s"$in-cp", new Configuration()),
      fmt, FileSourceOptions(), schema)

  test("csv with header and explicit schema") {
    withTmpDir { tmp =>
      val f = write(tmp, "a.csv", "id,v\n1,10\n2,20\n")
      val schema = StructType(Seq(StructField("id", LongType), StructField("v", LongType)))
      val df = source(tmp, "csv", Some(schema)).readBatch(spark, batchOf(f))
      assert(df.schema === schema)
      assert(df.count() === 2)
    }
  }

  test("ndjson (json-lines) and alias jsonl") {
    withTmpDir { tmp =>
      val f = write(tmp, "a.jsonl", """{"id":1,"v":10}""" + "\n" + """{"id":2,"v":20}""")
      val df = source(tmp, "jsonl", None).readBatch(spark, batchOf(f))
      assert(df.count() === 2)
      assert(df.columns.sorted.toSeq === Seq("id", "v"))
    }
  }

  test("orc round-trip via the native vectorized reader") {
    import spark.implicits._
    withTmpDir { tmp =>
      Seq((1L, "x"), (2L, "y")).toDF("id", "v")
        .coalesce(1).write.orc(s"$tmp/data")
      val f = new java.io.File(s"$tmp/data").listFiles()
        .filter(_.getName.endsWith(".orc")).head.getAbsolutePath
      val df = source(tmp, "orc", None).readBatch(spark, batchOf(f))
      assert(df.count() === 2)
      assert(df.columns.sorted.toSeq === Seq("id", "v"))
      // inference from extension picks orc too
      assert(graft.sources.FormatInference.infer(
        s"$tmp/data", None, Some("*.orc"), conf) === "orc")
    }
  }

  test("multiline json") {
    withTmpDir { tmp =>
      val f = write(tmp, "a.json", """[{"id": 1}, {"id": 2}, {"id": 3}]""")
      val df = source(tmp, "json", None).readBatch(spark, batchOf(f))
      assert(df.count() === 3)
    }
  }

  test("text format reads lines") {
    withTmpDir { tmp =>
      val f = write(tmp, "a.txt", "hello\nworld\n")
      val df = source(tmp, "text", None).readBatch(spark, batchOf(f))
      assert(df.collect().map(_.getString(0)).toSeq === Seq("hello", "world"))
    }
  }

  /** Hand-build a spec-shaped xlsx (ZIP of XML parts): shared strings
    * (incl. rich text), inline strings, numbers, booleans, a skipped
    * cell, and a workbook/rels indirection to a non-sheet1 part name. */
  private def writeXlsx(dir: String, name: String): String = {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val parts = Seq(
      "xl/workbook.xml" ->
        """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="data" sheetId="1" r:id="rId7"/></sheets></workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId7" Type="x" Target="worksheets/sheetX.xml"/></Relationships>""".stripMargin,
      "xl/sharedStrings.xml" ->
        """<?xml version="1.0"?><sst><si><t>id</t></si><si><t>label</t></si>
          |<si><r><t>rich</t></r><r><t> text</t></r></si></sst>""".stripMargin,
      "xl/worksheets/sheetX.xml" ->
        """<?xml version="1.0"?><worksheet><sheetData>
          |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>flag</t></is></c></row>
          |<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="s"><v>2</v></c><c r="C2" t="b"><v>1</v></c></row>
          |<row r="3"><c r="A3"><v>2.5</v></c><c r="C3" t="b"><v>0</v></c></row>
          |</sheetData></worksheet>""".stripMargin)
    val p = Paths.get(dir, name)
    Files.createDirectories(p.getParent)
    val zip = new ZipOutputStream(Files.newOutputStream(p))
    try parts.foreach { case (n, body) =>
      zip.putNextEntry(new ZipEntry(n)); zip.write(body.getBytes("UTF-8")); zip.closeEntry()
    } finally zip.close()
    p.toString
  }

  test("xlsx reads without POI: shared/inline strings, numbers, booleans, gaps") {
    withTmpDir { tmp =>
      val f = writeXlsx(tmp, "a.xlsx")
      val df = source(tmp, "xlsx", None).readBatch(spark, batchOf(f))
      assert(df.columns.toSeq === Seq("id", "label", "flag"))
      val rows = df.orderBy("id").collect()
      assert(rows.map(_.getString(0)).toSeq === Seq("1", "2.5"))
      assert(rows.map(_.getString(1)).toSeq === Seq("rich text", null)) // B3 skipped
      assert(rows.map(_.getString(2)).toSeq === Seq("true", "false"))
      // user schema casts by name
      val typed = StructType(Seq(StructField("id", DoubleType),
        StructField("flag", BooleanType)))
      val t = source(tmp, "excel", Some(typed)).readBatch(spark, batchOf(f))
      assert(t.orderBy("id").collect().map(r => (r.getDouble(0), r.getBoolean(1))).toSeq
        === Seq((1.0, true), (2.5, false)))
    }
  }

  test("unknown format still fails with a clear unsupported-format error") {
    withTmpDir { tmp =>
      val f = write(tmp, "a.orc", "xx")
      val e = intercept[UnsupportedFormatError](
        source(tmp, "sasdata", None).readBatch(spark, batchOf(f)))
      assert(e.getMessage.contains("not supported"))
    }
  }

  /** Write a real avro container file with avro core (the same jar the
    * reader uses) — primitives, nullable union, enum, bytes, array, map,
    * nested record. */
  private def writeAvro(dir: String, name: String): String = {
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema: Schema = SchemaBuilder.record("Doc").fields()
      .requiredLong("id")
      .optionalString("label")
      .name("kind").`type`().enumeration("Kind").symbols("A", "B").noDefault()
      .requiredBytes("payload")
      .name("tags").`type`().array().items().stringType().noDefault()
      .name("counts").`type`().map().values().longType().noDefault()
      .name("inner").`type`().record("Inner").fields()
        .requiredDouble("score").endRecord().noDefault()
      .endRecord()
    def rec(id: Long, label: String): GenericRecord = {
      val r = new GenericData.Record(schema)
      r.put("id", id)
      r.put("label", label) // null for id 2 below
      r.put("kind", new GenericData.EnumSymbol(schema.getField("kind").schema(),
        if (id % 2 == 0) "A" else "B"))
      r.put("payload", java.nio.ByteBuffer.wrap(Array[Byte](id.toByte, 0x7f)))
      r.put("tags", java.util.Arrays.asList(s"t$id", "common"))
      r.put("counts", java.util.Map.of("n", java.lang.Long.valueOf(id * 10)))
      val inner = new GenericData.Record(schema.getField("inner").schema())
      inner.put("score", id * 0.5)
      r.put("inner", inner)
      r
    }
    val p = Paths.get(dir, name)
    Files.createDirectories(p.getParent)
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, p.toFile)
    try {
      w.append(rec(1, "one"))
      val r2 = rec(2, null); r2.put("label", null); w.append(r2)
      w.append(rec(3, "three"))
    } finally w.close()
    p.toString
  }

  test("avro round-trip: schema mapping, nullable union, nested values") {
    withTmpDir { tmp =>
      assert(AvroSupport.isAvailable, s"avro probe failed: ${AvroSupport.probe}")
      val f = writeAvro(tmp, "docs.avro")
      val df = source(tmp, "avro", None).readBatch(spark, batchOf(f))
      assert(df.schema.fieldNames.toSeq ===
        Seq("id", "label", "kind", "payload", "tags", "counts", "inner"))
      assert(df.schema("label").dataType === StringType)
      assert(df.schema("payload").dataType === BinaryType)
      assert(df.schema("inner").dataType.isInstanceOf[StructType])
      val rows = df.orderBy("id").collect()
      assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
      assert(rows.map(_.getString(1)).toSeq === Seq("one", null, "three"))
      assert(rows.map(_.getString(2)).toSeq === Seq("B", "A", "B"))
      assert(rows(0).getAs[Array[Byte]]("payload").toSeq === Seq[Byte](1, 0x7f))
      assert(rows(2).getAs[Seq[String]]("tags") === Seq("t3", "common"))
      assert(rows(1).getAs[Map[String, Long]]("counts") === Map("n" -> 20L))
      assert(rows(2).getAs[org.apache.spark.sql.Row]("inner").getDouble(0) === 1.5)
      // multiple files in one batch
      val f2 = writeAvro(tmp, "docs2.avro")
      val both = source(tmp, "avro", None).readBatch(spark, batchOf(f, f2))
      assert(both.count() === 6)
    }
  }

  test("format inference: pattern suffix, extension, delta dir, parquet default") {
    withTmpDir { tmp =>
      val conf = new Configuration()
      assert(FormatInference.infer(tmp, Some("CSV"), None, conf) === "csv")
      assert(FormatInference.infer(tmp, None, Some("*.jsonl"), conf) === "ndjson")
      write(tmp, "d1/x.csv", "a\n1")
      assert(FormatInference.infer(s"$tmp/d1", None, None, conf) === "csv")
      Files.createDirectories(Paths.get(s"$tmp/d2/_delta_log"))
      assert(FormatInference.infer(s"$tmp/d2", None, None, conf) === "delta")
      Files.createDirectories(Paths.get(s"$tmp/d3"))
      assert(FormatInference.infer(s"$tmp/d3", None, None, conf) === "parquet")
    }
  }
}

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

  test("avro and excel fail with a clear unsupported-format error") {
    withTmpDir { tmp =>
      val f = write(tmp, "a.avro", "xx")
      Seq("avro", "excel", "xlsx").foreach { fmt =>
        val e = intercept[UnsupportedFormatError](
          source(tmp, fmt, None).readBatch(spark, batchOf(f)))
        assert(e.getMessage.contains("not supported"))
      }
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

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.{Files, Path}

/** Shared local SparkSession + tmpdir helpers for all suites. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def conf = spark.sparkContext.hadoopConfiguration

  def withTmpDir[T](f: String => T): T = {
    val dir: Path = Files.createTempDirectory("graft-test-")
    try f(dir.toString)
    finally {
      import scala.jdk.CollectionConverters._
      def sweep(): Unit = Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
      try sweep()
      catch { case _: java.nio.file.DirectoryNotEmptyException =>
        // a background writer (the RocksDB state store's maintenance
        // thread, an async commit upload) recreated files mid-sweep;
        // let it settle and take one more pass
        Thread.sleep(2000); sweep()
      }
    }
  }
}

object SparkSpec {
  lazy val session: SparkSession = graft.GraftSession.local(4, "graft-test")
}

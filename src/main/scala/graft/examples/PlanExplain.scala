package graft.examples

import graft.{GraftSession, Queries}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries to files — the
  * before/after plan evidence an optimization round commits alongside the
  * bench numbers ([[PlanDump]] prints the one-line exchange economy; this
  * writes the full formatted plan the round's write-up cites).
  *
  * Run: sbt "runMain graft.examples.PlanExplain <sfDir> <outDir> <suffix> <query> [query…]"
  * Writes <outDir>/<query>_<suffix>.txt per query.
  */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanExplain <sfDir> <outDir> <suffix> <query> [query…]")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val spark = GraftSession.builderDefaults(
      SparkSession.builder().master("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    args.drop(3).foreach { name =>
      val df = Queries.defs(name).build(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), formatted)
      println(s"wrote $outDir/${name}_$suffix.txt (${formatted.length} chars)")
    }
    spark.stop()
  }
}

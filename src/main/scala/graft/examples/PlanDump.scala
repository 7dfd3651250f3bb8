package graft.examples

import graft.{GraftSession, Queries}
import org.apache.spark.sql.SparkSession

/** Per-query physical-plan summary: exchange / broadcast counts for the
  * named queries — the quick shuffle-economy check to run after adding
  * or reshaping an operator ([[PlanAudit]] sweeps for FORBIDDEN shapes;
  * this prints the cost shape so a regression from one exchange to four
  * is visible before the bench run).
  *
  * Run: sbt "runMain graft.examples.PlanDump <sfDir> <query> [query…]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <query> [query…]")
    val spark = GraftSession.builderDefaults(
      SparkSession.builder().master("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      val df = Queries.defs(name).build(spark, args.head)
      val plan = df.queryExecution.executedPlan.toString
      // shuffles only: a bare "Exchange" count would also match
      // BroadcastExchange/ReusedExchange and misread exactly when
      // comparing runs (a broadcast added vs a shuffle added)
      val nShuffle = "Exchange (hash|range|Single)".r.findAllIn(plan).length
      val nBr = "BroadcastExchange".r.findAllIn(plan).length
      val nReused = "ReusedExchange".r.findAllIn(plan).length
      println(s"=== $name shuffles=$nShuffle broadcasts=$nBr " +
        s"reused=$nReused")
    }
  }
}

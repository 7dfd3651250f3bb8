package graft.examples

import graft.{GraftSession, Queries}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-clock profile of one query: the state-fold queries run a
  * SEQUENCE of jobs (tripwire counts, chunk writes, decision reads, the
  * final probe) whose individual costs the one formatted plan cannot show
  * — this prints every job's duration + description so an optimization
  * round can see WHICH of a fold's jobs carries the time.
  *
  * Run: sbt "runMain graft.examples.JobProfile <sfDir> <query> [repeat]"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobProfile <sfDir> <query> [repeat]")
    val sfDir = args(0)
    val name = args(1)
    val repeat = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.builderDefaults(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties).flatMap(p =>
            Option(p.getProperty("spark.job.description")))
            .orElse(js.stageInfos.lastOption.map(_.name))
            .getOrElse("")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
          val ms = (System.nanoTime() - t0) / 1e6
          System.err.println(f"[job ${je.jobId}%4d] $ms%9.1f ms  $desc")
        }
      }
    })
    // session warm-up identical to Bench
    spark.range(1000).groupBy(org.apache.spark.sql.functions.col("id") % 7)
      .count().collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    (1 to repeat).foreach { r =>
      System.err.println(s"=== $name run $r")
      val t0 = System.nanoTime()
      Queries.defs(name).build(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      System.err.println(f"=== $name run $r TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

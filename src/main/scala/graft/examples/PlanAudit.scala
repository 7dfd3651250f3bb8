package graft.examples

import graft.{GraftSession, Queries}
import org.apache.spark.sql.SparkSession

/** One-shot plan audit over the ENTIRE query inventory: build every
  * query's physical plan against a small SF and flag the antipatterns
  * the 100 TB design rules forbid — cartesian products, nested-loop
  * joins that aren't the 1-row scalar attach, and partition-less
  * windows (a window spec whose first element is an ORDER BY column
  * funnels the corpus into one task). PlanSuite pins these shapes for
  * the highest-risk operators; this audit sweeps the long tail on
  * demand so a regression in an unpinned query is still findable in
  * one command.
  *
  * Run: sbt "runMain graft.examples.PlanAudit [sfDir]"
  * Exit 1 iff any query trips a rule (build failures print but do not
  * trip — Delta lifecycle queries mutate scratch state and some only
  * plan fully after data exists).
  */
object PlanAudit {
  /** Queries whose ORACLE-GATE construction intentionally computes a
    * bounded exact reference via a non-equi join, with the bound written
    * into the query itself — the scale path is the operator under test,
    * not the reference side:
    *  - d_semdedup: exact cosine pairs over the 200-row planted-vector
    *    subset, the truth side of its recall gate (the operator side,
    *    semDedupPairs, is separately pinned BNLJ-free in PlanSuite). */
  private val waived = Set("d_semdedup")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builderDefaults(
      SparkSession.builder().master("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = List.empty[String]
    Queries.defs.toSeq.sortBy(_._1).foreach { case (name, qd) =>
      try {
        val df = qd.build(spark, sfDir)
        // Repo rule (round 12): no ORACLE-GATED query may emit a
        // non-scalar output column — the driver's pandas compare cannot
        // sort array/map/struct cells and records an err with NO
        // correctness signal (the r11 tokenize/pack/fim reds).
        // Stringify with array_join / ARRAY_TO_STRING instead
        // (q_array_agg precedent). Rows-only queries are exempt.
        val nonScalar =
          if (qd.oracle.isEmpty) Nil
          else df.schema.fields.collect {
            case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
              f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] ||
              f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] =>
              s"${f.name}:${f.dataType.simpleString}"
          }.toList
        val plan = df.queryExecution.executedPlan.toString
        val scalarBnlj = "BroadcastNestedLoopJoin BuildRight, Cross"
        val bnljCount = "BroadcastNestedLoopJoin".r.findAllMatchIn(plan).size
        val scalarCount = scalarBnlj.r.findAllMatchIn(plan).size
        val issues = List(
          if (plan.contains("CartesianProduct")) Some("CartesianProduct") else None,
          // the only tolerated nested-loop join is the scalar cross
          // attach (a grouping-less aggregate broadcast at 1 row)
          if (bnljCount > scalarCount) Some("non-scalar BroadcastNestedLoopJoin")
          else None,
          if ("""windowspecdefinition\(\w+#\d+L? ASC""".r.findFirstIn(plan).isDefined)
            Some("partition-less window") else None,
          if (nonScalar.nonEmpty)
            Some(s"non-scalar oracle-gated output (${nonScalar.mkString(", ")})")
          else None
        ).flatten
        if (issues.nonEmpty && !waived.contains(name)) {
          flagged ::= s"$name: ${issues.mkString(", ")}"
          println(s"FLAG $name: ${issues.mkString(", ")}")
        } else if (issues.nonEmpty)
          println(s"waiv $name: ${issues.mkString(", ")} (documented oracle-gate bound)")
        else println(s"ok   $name")
      } catch {
        case e: Exception =>
          println(s"skip $name (${e.getClass.getSimpleName}: " +
            s"${String.valueOf(e.getMessage).takeWhile(_ != '\n').take(120)})")
      }
    }
    println(s"\naudit: ${flagged.size} flagged of ${Queries.defs.size}")
    spark.stop()
    if (flagged.nonEmpty) sys.exit(1)
  }
}

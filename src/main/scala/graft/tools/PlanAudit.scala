package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: physical-plan shape audit for registry queries — prints the
  * exchange/join/window node census per query so shuffle regressions and
  * accidental cartesian products show up as a diff, not a slow bench.
  * Usage: sbt "runMain graft.tools.PlanAudit <sfDir> [q_a,q_b,...]". */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.lift(1).map(_.split(",").toSet)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq("Exchange", "BroadcastExchange", "CartesianProduct",
      "BroadcastNestedLoopJoin", "SortMergeJoin", "BroadcastHashJoin",
      "ShuffledHashJoin", "Window", "Generate", "HashAggregate",
      "ObjectHashAggregate", "SortAggregate", "WholeStageCodegen")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, dir).queryExecution.executedPlan.toString()
          // word-boundary match: a raw substring count would fold every
          // BroadcastExchange into Exchange and ObjectHashAggregate into
          // HashAggregate, misattributing regressions in the census diff
          val census = interesting.map(k =>
            k -> ("(?<![A-Za-z])" + k + "(?![a-z])").r
              .findAllMatchIn(plan).size)
            .filter(_._2 > 0)
            .map { case (k, c) => s"$k=$c" }.mkString(" ")
          println(s"[plan] $name :: $census")
          if (plan.contains("CartesianProduct") ||
              plan.contains("BroadcastNestedLoopJoin"))
            println(s"[plan] $name WARNING: product join present")
        } catch { case e: Throwable =>
          println(s"[plan] $name FAILED: ${e.getMessage.take(120)}")
        }
        spark.sharedState.cacheManager.clearCache()
      }
    spark.stop()
  }
}

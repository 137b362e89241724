package graft.tools

/** Plan-census audit: runs registry queries at sf0.01 and prints one
  * line per query counting shuffle/broadcast exchanges, cartesian
  * products, nested-loop joins and generates in the FINAL (post-AQE)
  * physical plan. Usage:
  *   sbt "runMain graft.tools.PlanAudit [qname ...]"
  * No args = the round's new-query list. */
object PlanAudit {
  def main(a: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val qs = if (a.nonEmpty) a.toSeq
      else Seq("q13_custdist", "q15_top_supplier", "q16_part_supplier",
        "q19_discounted", "q21_waiting_supplier", "q22_global_sales",
        "q_rollup_distinct", "q_rollup_var", "q_rollup_histogram",
        "q_hidden_partition_hour", "q_ann_ivf_index_update")
    for (q <- qs) {
      val df = graft.SparkEntry.queries(q)(s, dir)
      df.collect()
      val full = df.queryExecution.executedPlan.toString
      val fin = full.split("== Initial Plan ==")(0)
      val keys = Seq(
        "Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition", "BroadcastExchange",
        "CartesianProduct", "BroadcastNestedLoopJoin", "Generate ")
      val c = keys.map(k => k.trim -> k.r.findAllIn(fin).size)
        .filter(_._2 > 0).toMap
      println(s"$q :: " + (if (c.isEmpty) "no exchanges" else
        c.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(" ")))
    }
    s.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: idle-pass timing of named registry queries — the
  * watch-list discipline for bench entries flagged `unstable` (run a
  * few passes on a quiet machine, record the medians in PLANS.md).
  * Usage: sbt "runMain graft.tools.TimeQueries <sfDir> q_a,q_b [runs]". */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        s"${graft.queries.Scratch.baseDir}/graft-spark-local")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/region.parquet").count() // warm-up
    names.foreach { n =>
      val q = graft.SparkEntry.queries(n)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        q(spark, dir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      val s = times.sorted
      val med =
        if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
      println(f"[time] $n median=$med%.2f s runs=" +
        times.map(t => f"$t%.2f").mkString(","))
    }
    spark.stop()
  }
}

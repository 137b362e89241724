package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftExtensions, SparkEntry}
import graft.util.Phase

/** Per-phase profiling of the table-lifecycle bench queries (the VERDICT
  * round-4 lead item): runs the named queries (default: the two merge
  * queries) with [[Phase]] timing enabled and prints a per-phase breakdown
  * after each run, so a lifecycle regression can be pinned to stage /
  * stats / probe / commit / read rather than guessed at.
  *
  * Usage: sbt "runMain graft.tools.ProfileMerge [queryName ...]"
  * (SPARK_GRAFT_SF_DIR selects the scale, default sf0.1).
  */
object ProfileMerge {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_table_merge", "q_table_merge_mor")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()

    Phase.enable()
    val queries = SparkEntry.queries
    names.foreach { name =>
      val fn = queries(name)
      // warm-up run (JIT/codegen), then a timed run with a fresh ledger
      fn(spark, sfDir).queryExecution.toRdd.count()
      spark.sharedState.cacheManager.clearCache()
      Phase.reset()
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val total = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      val phases = Phase.snapshot().map(_._2).sum
      println(f"== $name: $total%.3f s total, $phases%.3f s in phases ==")
      println(Phase.report())
    }
    spark.stop()
  }
}

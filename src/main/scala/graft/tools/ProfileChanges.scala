package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.table.GraftTable

/** Dev tool: phase timing for the CDC changelog query recipe
  * (q_table_changes) — scratch build vs changes() evaluation, per run.
  * Usage: sbt "runMain graft.tools.ProfileChanges /root/testdata/sf0.1". */
object ProfileChanges {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val loc = java.nio.file.Files.createTempDirectory("profchg").toString
      val t = GraftTable(spark, s"$loc/t")
      val orders = Tables.load(spark, dir, "orders")
      timed("append")(t.append(
        orders.filter(col("o_orderkey") % 2 === 0),
        parts = Seq("o_orderstatus")))
      timed("cow-merge")(t.merge(
        orders.filter(col("o_orderkey") % 3 === 0)
          .withColumn("o_orderstatus", lit("X")),
        keys = Seq("o_orderkey"), dedupKey = Seq("o_orderkey"),
        orderCol = "o_orderkey"))
      timed("mor-merge")(t.merge(
        orders.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_orderstatus", lit("Y")),
        keys = Seq("o_orderkey"), dedupKey = Seq("o_orderkey"),
        orderCol = "o_orderkey", mode = "mor"))
      val ids = t.snapshots.map(_.snapshotId)
      val chg = timed("changes-plan")(
        t.changes(ids.head - 1, ids.last))
      timed("changes-exec")(chg.queryExecution.toRdd.count())
      timed("changes-exec-2nd")(chg.queryExecution.toRdd.count())
    }
    // the registry query exactly as the bench drives it
    (1 to 3).foreach { i =>
      timed(s"registry-q_table_changes-$i")(
        graft.SparkEntry.queries("q_table_changes")(spark,
          dir).queryExecution.toRdd.count())
    }
    spark.stop()
  }
}

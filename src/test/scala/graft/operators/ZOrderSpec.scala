package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.table.GraftTable

/** Z-order clustering: the Morton interleave primitive, and the
  * behavioral pin that a z-clustered write prunes files on EVERY
  * clustered dimension (where single-column sort serves only one). */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("InterleaveBits: Morton bit interleave semantics") {
    val out = Seq((3L, 0L), (0L, 3L), (3L, 3L), (0L, 0L))
      .toDF("a", "b")
      .select(ZOrder.interleave_bits(array($"a", $"b"), 2).as("z"))
      .as[Long].collect()
    // bit layout (2 cols, 2 bits): z = a0, b0, a1, b1
    assert(out === Array(
      0x5L, // a=11 -> bits 0,2 set
      0xAL, // b=11 -> bits 1,3 set
      0xFL, // both
      0x0L))
    // null elements contribute zero bits
    val z = Seq(1).toDF("x")
      .select(ZOrder.interleave_bits(
        array(lit(3L), lit(null).cast("long")), 2).as("z"))
      .as[Long].collect()(0)
    assert(z === 0x5L)
  }

  /** numFiles scanned by the executed plan (unwraps AQE). */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Long = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case other => other.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.sum
    }
    scans(df.queryExecution.executedPlan)
  }

  test("z-clustered write prunes on BOTH dimensions; row content unchanged") {
    val dir = tmpDir("zorder-2d") + "/t"
    val t = GraftTable(spark, dir)
    // 100×100 grid, shuffled — neither dimension is pre-sorted
    val grid = (0L until 10000L).map { i =>
      val s = (i * 2654435761L) % 10000L
      (s / 100L, s % 100L, s)
    }.toDF("x", "y", "payload")
    t.append(ZOrder.arrange(grid, Seq("x", "y"), bits = 8,
      numFiles = Some(16)))
    val nFiles = t.liveFiles().size
    assert(nFiles === 16)

    val all = spark.read.format("graft").load(dir)
    // a 10-wide slice in x touches only the files whose x-rectangle
    // overlaps it — and the SAME holds for y (single-column sort by x
    // would leave every file spanning y's full range)
    // bound: a 10% slice must prune at least half the files in EITHER
    // dimension (range-sample boundary straddles can add a file, so the
    // bound is not the theoretical 4-of-16)
    val xScanned = scannedFiles(all.filter($"x" < 10L))
    val yScanned = scannedFiles(all.filter($"y" < 10L))
    assert(xScanned > 0 && xScanned <= 8,
      s"x-slice scanned $xScanned of $nFiles files")
    assert(yScanned > 0 && yScanned <= 8,
      s"y-slice scanned $yScanned of $nFiles files")
    // data intact
    assert(all.count() === 10000)
    assert(all.filter($"x" < 10L).count() === 1000)
    assert(all.agg(sum($"payload")).as[Long].collect()(0) ===
      (0L until 10000L).sum)
  }

  test("zvalue handles constant and null-bearing columns") {
    val df = Seq((1L, Option(5L)), (2L, None), (3L, Option(5L)))
      .toDF("a", "b")
    // b is constant-or-null → degrades to bucket 0, no crash
    val z = df.select(ZOrder.zvalue(df, Seq("a", "b"), 4).as("z"))
      .as[Long].collect()
    assert(z.length === 3)
    assert(z.distinct.length > 1) // a still differentiates
  }
}

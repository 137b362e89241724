package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}
import graft.SparkSpec

/** float→double type promotion (the last Iceberg primitive-widening the
  * engine refused): the VALUE conversion is exact, but the recorded
  * per-file stat STRINGS were rendered from floats ("0.7") and parsing
  * them back as DOUBLE lands on a different real than the exact float
  * bound (0.7f = 0.69999998807...d) — naive reuse would prune files
  * unsoundly in BOTH directions. statsFor re-renders float-era bounds
  * through the exact conversion at resolution time (and drops the
  * type-dependent Bloom bitsets), so pruning stays sound with no file
  * rewrite. These tests pin the exact failure mode end-to-end through
  * the format("graft") pruning scan. */
class FloatWidenSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String) = GraftTable(spark, tmpDir(name) + "/t")

  test("widen float→double: exact values, re-rendered bounds, dropped " +
      "float-era blooms, sound pruning in both directions") {
    val t = fresh("fw-widen")
    val df = Seq((1L, 0.2f)).toDF("id", "x")
    t.create(df.schema,
      properties = Map("graft.bloom.columns" -> "x"))
    t.append(df.coalesce(1))                       // file A: max 0.2f
    t.append(Seq((2L, 0.7f)).toDF("id", "x"))      // file B: min 0.7f
    val live = t.liveFiles()
    val pre = t.statsFor(live)
    assert(pre.values.exists(_("x").max === Some("0.2")))
    assert(pre.values.forall(_("x").bloom.isDefined))

    t.widenColumn("x", DoubleType)
    assert(t.schema("x").dataType === DoubleType)

    // values read back EXACT (float→double is exact)
    val xs = t.read().select("x").as[Double].collect().sorted
    assert(xs === Array(0.2f.toDouble, 0.7f.toDouble))

    // bounds re-rendered through the exact conversion; float-era blooms
    // dropped (their hashes were computed over float bytes)
    val post = t.statsFor(live)
    val maxes = post.values.map(_("x").max.get.toDouble).toSet
    assert(maxes.contains(0.2f.toDouble)) // 0.20000000298..., NOT 0.2
    assert(post.values.forall(_("x").bloom.isEmpty))

    // pruning soundness END TO END, both directions:
    // 0.2f.toDouble > 0.2d — a naively-parsed max of "0.2" would prune
    // file A for `x > 0.2` and silently lose the row
    val scan = spark.read.format("graft").load(t.location)
    assert(scan.filter(col("x") > lit(0.2d)).count() === 2)
    // 0.7f.toDouble < 0.7d — a naively-parsed min of "0.7" would prune
    // file B for `x < 0.7` and silently lose the row
    assert(scan.filter(col("x") < lit(0.7d)).count() === 2)
    // and pruning still WORKS (not just disabled): impossible ranges
    assert(scan.filter(col("x") > lit(1.0d)).count() === 0)

    // post-widen files are double-era: stats and blooms record normally
    t.append(Seq((3L, 42.5)).toDF("id", "x"))
    val newFile = t.liveFiles().diff(live)
    assert(newFile.size === 1)
    val ns = t.statsFor(newFile)(newFile.head)("x")
    assert(ns.max === Some("42.5") && ns.bloom.isDefined)
  }

  test("widen float→double composes with time travel and rewrite") {
    val t = fresh("fw-tt")
    t.append(Seq((1L, 0.1f), (2L, 0.9f)).toDF("id", "x"))
    val s1 = t.latestSnapshotId.get
    t.widenColumn("x", DoubleType)
    // historical read keeps the float schema
    assert(t.readAsOf(s1).schema("x").dataType === FloatType)
    assert(t.read().schema("x").dataType === DoubleType)
    // a COW rewrite after the widen materializes doubles; stats then
    // record under the new type natively
    t.delete(col("id") === 2L)
    assert(t.read().select("x").as[Double].collect() ===
      Array(0.1f.toDouble))
  }

  test("widening a partition source column is refused") {
    val t = fresh("fw-part")
    t.append(Seq((1L, 2, "a")).toDF("id", "b", "v"), parts = Seq("b"))
    val e = intercept[IllegalArgumentException](
      t.widenColumn("b", org.apache.spark.sql.types.LongType))
    assert(e.getMessage.contains("partition source"))
  }
}

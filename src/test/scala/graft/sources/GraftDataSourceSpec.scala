package graft.sources

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.table.GraftTable

class GraftDataSourceSpec extends SparkSpec {
  import spark.implicits._

  test("format(\"graft\") round-trip: write append/overwrite, read latest") {
    val dir = tmpDir("ds-rt") + "/t"
    Seq((1L, "a", "p1"), (2L, "b", "p2")).toDF("id", "v", "part")
      .write.format("graft").option("partitionCols", "part")
      .mode(SaveMode.Append).save(dir)
    Seq((3L, "c", "p1")).toDF("id", "v", "part")
      .write.format("graft").mode(SaveMode.Append).save(dir)

    val back = spark.read.format("graft").load(dir)
    assert(back.count() === 3)
    assert(back.schema.fieldNames.sorted === Array("id", "part", "v"))
    assert(back.filter($"part" === "p1").select("id").as[Long]
      .collect().sorted === Array(1L, 3L))
  }

  test("snapshotId option time-travels") {
    val dir = tmpDir("ds-tt") + "/t"
    val t = GraftTable(spark, dir)
    t.append(Seq((1L, "a")).toDF("id", "v"))
    val s1 = t.latestSnapshotId.get
    t.append(Seq((2L, "b")).toDF("id", "v"))

    val asOf = spark.read.format("graft")
      .option("snapshotId", s1.toString).load(dir)
    assert(asOf.select("id").as[Long].collect() === Array(1L))
  }

  test("startSnapshotId/endSnapshotId options read incrementally") {
    val dir = tmpDir("ds-incr") + "/t"
    val t = GraftTable(spark, dir)
    t.append(Seq((1L, "a")).toDF("id", "v"))
    val s1 = t.latestSnapshotId.get
    t.append(Seq((2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))

    val inc = spark.read.format("graft")
      .option("startSnapshotId", s1.toString).load(dir)
    assert(inc.select("id").as[Long].collect().sorted === Array(2L, 3L))
    val bounded = spark.read.format("graft")
      .option("startSnapshotId", s1.toString)
      .option("endSnapshotId", (s1 + 1).toString).load(dir)
    assert(bounded.select("id").as[Long].collect() === Array(2L))
  }

  test("partition pruning happens in the file index, predicate pushdown works") {
    val dir = tmpDir("ds-prune") + "/t"
    (1 to 4).map(i => (i.toLong, s"v$i", s"p${i % 2}"))
      .toDF("id", "v", "part")
      .write.format("graft").option("partitionCols", "part")
      .mode(SaveMode.Append).save(dir)

    val all = spark.read.format("graft").load(dir)
    val nAllFiles = all.inputFiles.length
    val pruned = all.filter($"part" === "p1" && $"id" > 0L)
    assert(pruned.collect().map(_.getAs[Long]("id")).sorted === Array(1L, 3L))
    // the executed scan must only have touched part=p1's files (unwrap AQE)
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Long = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case other => other.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.sum
    }
    val numFiles = scans(pruned.queryExecution.executedPlan)
    assert(numFiles > 0 && numFiles < nAllFiles,
      s"scan read $numFiles of $nAllFiles files — partition pruning inactive")
    // predicate pushdown to parquet survives the custom FileIndex
    val explained = pruned.queryExecution.executedPlan.toString
    assert(explained.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,0)]")
      || explained.contains("GreaterThan(id,0)"), explained.take(2000))
  }

  test("null-count file pruning in the graft scan: IS NULL skips " +
      "zero-null files, IS NOT NULL skips all-null files (the optimizer " +
      "injects it beside ordinary predicates), results exact") {
    import org.apache.spark.sql.functions.col
    val t = graft.table.GraftTable(spark, tmpDir("ds-nullprune") + "/t")
    t.append(Seq((1L, Option(1.0)), (2L, Option(2.0)))
      .toDF("id", "v").repartition(1)) // zero nulls in v
    t.append(Seq((3L, None: Option[Double]), (4L, None: Option[Double]))
      .toDF("id", "v").repartition(1)) // ALL null
    t.append(Seq((5L, Option(5.0)), (6L, None: Option[Double]))
      .toDF("id", "v").repartition(1)) // mixed
    def scan() = spark.read.format("graft").load(t.location)
    assert(scan().inputFiles.length === 3)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      def scans(p: org.apache.spark.sql.execution.SparkPlan): Long =
        p match {
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => scans(a.executedPlan)
          case other => other.collect {
            case f: org.apache.spark.sql.execution.FileSourceScanExec =>
              f.metrics("numFiles").value
          }.sum
        }
      scans(df.queryExecution.executedPlan)
    }

    val isNull = scan().filter(col("v").isNull)
    assert(isNull.select("id").collect().map(_.getLong(0)).sorted ===
      Array(3L, 4L, 6L))
    assert(scannedFiles(isNull) === 2, "zero-null file must be skipped")

    // a plain value predicate: the optimizer adds IsNotNull(v), which
    // must skip the all-null file even though v's bounds can't
    val pos = scan().filter(col("v") > 0.0)
    assert(pos.select("id").collect().map(_.getLong(0)).sorted ===
      Array(1L, 2L, 5L))
    assert(scannedFiles(pos) === 2, "all-null file must be skipped")
  }

  test("SQL over the source: create temp view via format table") {
    val dir = tmpDir("ds-sql") + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.format("graft").mode(SaveMode.Append).save(dir)
    spark.read.format("graft").load(dir).createOrReplaceTempView("graft_sql_t")
    assert(spark.sql("SELECT count(*) FROM graft_sql_t").as[Long]
      .collect()(0) === 2L)
    spark.catalog.dropTempView("graft_sql_t")
  }

  test("ErrorIfExists and Ignore save modes behave") {
    val dir = tmpDir("ds-modes") + "/t"
    val df = Seq((1L, "a")).toDF("id", "v")
    df.write.format("graft").mode(SaveMode.ErrorIfExists).save(dir)
    intercept[IllegalStateException] {
      df.write.format("graft").mode(SaveMode.ErrorIfExists).save(dir)
    }
    df.write.format("graft").mode(SaveMode.Ignore).save(dir) // no-op
    assert(spark.read.format("graft").load(dir).count() === 1)
  }
}

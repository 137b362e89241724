package graft.table

import graft.SparkSpec

class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema append adds new nullable columns; old files read null") {
    val t = GraftTable(spark, tmpDir("se-add") + "/t")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b", 7.5)).toDF("id", "v", "score"), mergeSchema = true)
    val out = t.read().orderBy("id").collect()
    assert(t.schema.fieldNames.toSeq === Seq("id", "v", "score"))
    assert(t.schema("score").nullable)
    assert(out(0).isNullAt(2)) // old row: evolved column is null
    assert(out(1).getDouble(2) === 7.5)
  }

  test("mergeSchema append with missing columns null-fills") {
    val t = GraftTable(spark, tmpDir("se-fill") + "/t")
    t.append(Seq((1L, "a", 1.0)).toDF("id", "v", "score"))
    t.append(Seq((2L, "b")).toDF("id", "v"), mergeSchema = true)
    val out = t.read().orderBy("id").collect()
    assert(out(1).isNullAt(2))
    assert(t.read().count() === 2)
  }

  test("missing NULLABLE columns null-fill; non-nullable are rejected") {
    import org.apache.spark.sql.types._
    // Iceberg optional-column write semantics: a batch may omit nullable
    // columns (a concurrent evolve can add one between a writer's plan
    // and its commit retry — strictness here would break those appends)
    val t = GraftTable(spark, tmpDir("se-strict") + "/t")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq(2L).toDF("id"))
    assert(t.read().filter(org.apache.spark.sql.functions.col("v").isNull)
      .count() === 1)
    // a non-nullable column can never be omitted
    val t2 = GraftTable(spark, tmpDir("se-strict2") + "/t")
    t2.create(StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("v", StringType))))
    intercept[IllegalArgumentException] {
      t2.append(Seq("x").toDF("v"))
    }
    // overwrite refuses EXTRA columns: with null-fill active, a typo'd
    // name would otherwise silently null-wipe the real column table-wide
    val t3 = GraftTable(spark, tmpDir("se-strict3") + "/t")
    t3.append(Seq((1L, "a")).toDF("id", "value"))
    val ex = intercept[IllegalArgumentException] {
      t3.overwrite(Seq((2L, "b")).toDF("id", "valu"))
    }
    assert(ex.getMessage.contains("valu"))
    assert(t3.read().count() === 1) // nothing committed
  }

  test("without mergeSchema, EXTRA columns are rejected, not silently dropped") {
    val t = GraftTable(spark, tmpDir("se-extra") + "/t")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    val ex = intercept[IllegalArgumentException] {
      t.append(Seq((2L, "b", true)).toDF("id", "v", "flag"))
    }
    assert(ex.getMessage.contains("flag"))
  }

  test("writer option mergeSchema=true evolves through format(\"graft\")") {
    val dir = tmpDir("se-writer") + "/t"
    Seq((1L, "a")).toDF("id", "v")
      .write.format("graft").mode("append").save(dir)
    intercept[Exception] { // strict by default
      Seq((2L, "b", 1.5)).toDF("id", "v", "score")
        .write.format("graft").mode("append").save(dir)
    }
    Seq((2L, "b", 1.5)).toDF("id", "v", "score")
      .write.format("graft").option("mergeSchema", "true")
      .mode("append").save(dir)
    val back = spark.read.format("graft").load(dir)
    assert(back.columns.toSeq === Seq("id", "v", "score"))
    assert(back.count() === 2)
  }

  test("historical reads use the schema their snapshot was committed under") {
    val t = GraftTable(spark, tmpDir("se-tt") + "/t")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    val s1 = t.latestSnapshotId.get
    t.append(Seq((2L, "b", 9L)).toDF("id", "v", "extra"), mergeSchema = true)
    // latest read: 3 columns; as-of read uses the AS-OF schema (Iceberg
    // semantics — a column added later must not appear null-filled in
    // time-travel results)
    assert(t.read().columns.length === 3)
    assert(t.readAsOf(s1).columns.toSeq === Seq("id", "v"))
    assert(t.readAsOf(s1).count() === 1)
    // same through the data source's snapshotId option
    val asOf = spark.read.format("graft")
      .option("snapshotId", s1.toString).load(t.location)
    assert(asOf.columns.toSeq === Seq("id", "v"))
    // incremental reads resolve the END snapshot's schema
    val inc = t.readIncremental(s1, t.latestSnapshotId.get)
    assert(inc.columns.toSeq === Seq("id", "v", "extra"))
    assert(inc.count() === 1)
  }

}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-registered native functions via SparkSessionExtensions. Needs its
  * own session (extensions bind at build time). */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // force a NEW session (sharing any existing context) so withExtensions
    // applies even when another suite already built the shared session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("native expressions are callable from pure SQL") {
    val row = spark.sql(
      """SELECT rolling_hash64('hello world') AS rh,
        |       simhash64(array('a','b','c')) AS sh,
        |       word_shingles(array('a','b','c','d'), 3) AS ws,
        |       hyperplane_bucket(array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT)), 8, 7) AS hb,
        |       interleave_bits(array(3L, 0L), 2) AS zb
        |""".stripMargin).collect()(0)
    assert(row.getAs[Long]("zb") === 0x5L)
    assert(row.getAs[Long]("rh") ===
      functions.HashExpressions.RollingHash64.hash("hello world".getBytes("UTF-8")))
    assert(row.getSeq[String](row.fieldIndex("ws")) === Seq("a b c", "b c d"))
    assert(row.getAs[Long]("hb") >= 0L)
  }

  test("SQL and Scala APIs agree on the same input") {
    import spark.implicits._
    val df = Seq("the quick brown fox").toDF("text")
    df.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT rolling_hash64(text) AS h FROM ext_docs").as[Long].collect()(0)
    val viaScala = df.select(
      functions.HashExpressions.rolling_hash64($"text").as("h"))
      .as[Long].collect()(0)
    assert(viaSql === viaScala)
  }

  test("wrong arity or input type fails at analysis, not deep in planning") {
    import org.apache.spark.sql.AnalysisException
    // arity
    intercept[AnalysisException](spark.sql("SELECT rolling_hash64()"))
    intercept[AnalysisException](spark.sql("SELECT simhash64()"))
    intercept[AnalysisException](
      spark.sql("SELECT word_shingles(array('a','b'))"))
    intercept[AnalysisException](
      spark.sql("SELECT hyperplane_bucket(array(CAST(1.0 AS FLOAT)))"))
    // input types (ExpectsInputTypes → clean AnalysisException, not a
    // runtime ClassCastException or Janino compile error)
    intercept[AnalysisException](spark.sql("SELECT rolling_hash64(123)").collect())
    intercept[AnalysisException](
      spark.sql("SELECT simhash64('not-an-array')").collect())
    intercept[AnalysisException](
      spark.sql("SELECT word_shingles(map('a','b'), 2)").collect())
    intercept[AnalysisException](
      spark.sql("SELECT hyperplane_bucket(array(1.0, 2.0), 8)").collect())
  }

  test("SQL INSERT INTO a graft table is rejected (bypasses the snapshot log)") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("ext-insert").toString
    val cat = graft.catalog.GraftCatalog(spark, wh)
    cat.createFrom("ext_guarded", Seq((1L, "a")).toDF("id", "v"))
    val e = intercept[Exception](
      spark.sql("INSERT INTO ext_guarded VALUES (2, 'b')"))
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(
        _.contains("snapshot log"))))
    // nothing was committed AND no stray parquet landed in the table dir
    assert(cat.table("ext_guarded").read().count() === 1)
    cat.drop("ext_guarded")
  }
}

package graft.pipeline

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.table.GraftTable

/** End-to-end golden test of the medallion pipeline, replaying the
  * reference's deterministic demo scenario: 5 static `I` rows
  * (/root/reference/datagen/raw-datagen.py:90-96), then 2 `U` rows for
  * invoiceids 40994/83597 with ####-suffixed categories
  * (/root/reference/datagen/updates_iceberg.py:91-94). After both runs the
  * silver table must hold 5 rows with the two categories updated. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val header = Seq("Op", "replicadmstimestamp", "invoiceid", "itemid",
    "category", "price", "quantity", "orderdate", "destinationstate",
    "shippingtype", "referral").mkString("\t")

  private val batch1 = Seq(
    "I\t2024-02-16 15:30:41.041474\t24137\t34\tdegree\t53.51\t1\t2023-03-29\tSC\t3-Day\tbook",
    "I\t2024-08-20 17:16:03.213831\t15587\t59\tbit\t40.94\t5\t2022-07-16\tPW\t3-Day\tmanagement",
    "I\t2024-10-28 20:02:37.424182\t42918\t69\tschool\t27.23\t3\t2024-04-29\tCT\t2-Day\ttrouble",
    "I\t2024-06-27 14:36:25.103244\t40994\t67\tmarket\t92.02\t1\t2021-05-21\tVI\t2-Day\tothers",
    "I\t2024-02-01 19:52:59.444793\t83597\t37\tlanguage\t97.07\t3\t2021-09-10\tSC\tStandard\tplay")

  private val batch2 = Seq(
    "U\t2024-06-27 14:36:25.103244\t40994\t67\tmarket####\t92.02\t1\t2021-05-21\tVI\t2-Day\tothers",
    "U\t2024-02-01 19:52:59.444793\t83597\t37\tlanguage####\t97.07\t3\t2021-09-10\tSC\tStandard\tplay")

  private def writeTsv(dir: String, name: String, rows: Seq[String],
      mtime: Long): Unit = {
    val p = Paths.get(dir, name)
    Files.write(p, (header +: rows).mkString("\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    p.toFile.setLastModified(mtime)
  }

  test("golden I-then-U scenario: silver converges to 5 rows with updates") {
    val base = tmpDir("pipeline-golden")
    val rawDir = s"$base/raw"; Files.createDirectories(Paths.get(rawDir))
    val bronzeDir = s"$base/bronze"
    val silverDir = s"$base/silver"
    val ingest = new RawToBronze(spark, rawDir, bronzeDir, s"$base/ck-ingest.json")
    val upsert = new BronzeToSilver(spark, bronzeDir, silverDir, s"$base/ck-merge.json")
    val t0 = System.currentTimeMillis() - 60000

    // -- run 1: initial load
    writeTsv(rawDir, "batch1.tsv", batch1, t0)
    assert(ingest.run() === 5L)
    assert(upsert.run() === 5L)

    val silver = GraftTable(spark, silverDir)
    assert(silver.read().count() === 5)
    assert(silver.schema.fieldNames.toSeq === Seq("replicadmstimestamp",
      "invoiceid", "itemid", "category", "price", "quantity", "orderdate",
      "destinationstate", "shippingtype", "referral"))

    // -- run 2: CDC update batch (newer mtime so discovery picks it up)
    writeTsv(rawDir, "batch2.tsv", batch2, t0 + 30000)
    assert(ingest.run() === 2L) // rows ingested THIS run (bronze now 5+2)
    assert(upsert.run() === 5L) // silver count stable — pure updates

    val cats = silver.read()
      .filter($"invoiceid".isin(40994L, 83597L))
      .orderBy("invoiceid")
      .select("category").as[String].collect()
    assert(cats === Array("market####", "language####"))
    // non-updated rows untouched
    assert(silver.read().filter($"invoiceid" === 24137L)
      .select("category").as[String].collect() === Array("degree"))
  }

  test("ingest is incremental: re-run without new files is a no-op") {
    val base = tmpDir("pipeline-noop")
    val rawDir = s"$base/raw"; Files.createDirectories(Paths.get(rawDir))
    val ingest = new RawToBronze(spark, rawDir, s"$base/bronze", s"$base/ck.json")
    writeTsv(rawDir, "b1.tsv", batch1, System.currentTimeMillis() - 5000)
    assert(ingest.run() === 5L)
    assert(ingest.run() === 0L) // checkpointed; nothing new
    val bronze = GraftTable(spark, s"$base/bronze")
    assert(bronze.latestSnapshotId.get === 1L) // create + one append only
  }

  test("merge run short-circuits when bronze snapshot unchanged") {
    val base = tmpDir("pipeline-short")
    val rawDir = s"$base/raw"; Files.createDirectories(Paths.get(rawDir))
    val ingest = new RawToBronze(spark, rawDir, s"$base/bronze", s"$base/cki.json")
    val upsert = new BronzeToSilver(spark, s"$base/bronze", s"$base/silver", s"$base/ckm.json")
    writeTsv(rawDir, "b1.tsv", batch1, System.currentTimeMillis() - 5000)
    ingest.run()
    assert(upsert.run() === 5L)
    assert(upsert.run() === -1L) // no new bronze snapshot
  }

  test("ingest filter drops non-positive price/quantity rows (P2)") {
    val base = tmpDir("pipeline-filter")
    val rawDir = s"$base/raw"; Files.createDirectories(Paths.get(rawDir))
    val bad = Seq(
      "I\t2024-01-01 00:00:00.000000\t1\t1\tx\t-5.0\t1\t2024-01-01\tCA\t2-Day\tweb",
      "I\t2024-01-01 00:00:00.000000\t2\t1\ty\t5.0\t0\t2024-01-01\tCA\t2-Day\tweb",
      "I\t2024-01-01 00:00:00.000000\t3\t1\tz\t5.0\t2\t2024-01-01\tCA\t2-Day\tweb")
    writeTsv(rawDir, "bad.tsv", bad, System.currentTimeMillis() - 5000)
    val ingest = new RawToBronze(spark, rawDir, s"$base/bronze", s"$base/ck.json")
    assert(ingest.run() === 1L) // only invoiceid 3 survives
    val bronze = GraftTable(spark, s"$base/bronze")
    assert(bronze.read().select("invoiceid").as[Long].collect() === Array(3L))
    // lineage columns present (P3–P5)
    assert(bronze.schema.fieldNames.takeRight(3).toSeq ===
      Seq("input_file", "processed_time", "processed_date"))
  }
}

package graft.queries

import java.nio.file.{Files, Paths}
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{BronzeToSilver, RawToBronze}

/** The reference's end-to-end medallion scenario as a registry query: raw
  * TSV batches (the exact static I/U rows from
  * /root/reference/datagen/raw-datagen.py:90-96 and
  * /root/reference/datagen/updates_iceberg.py:91-94) ingested to bronze,
  * merged to silver, final silver state returned. Fully deterministic, so
  * the oracle is a VALUES literal of the expected converged table. */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

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

  /** run E1 (×2 batches) + E2 (×2 merges) in a scratch warehouse; the
    * medallion tables are addressed BY NAME through a GraftCatalog (the
    * reference's dev.icebergdb.bronze/silver pattern) and the final state
    * is read back by bare SQL name. */
  val qPipelineCdc: Q = (s, _) => {
    val base = s"${Scratch.baseDir}/graft-q-pipe-${UUID.randomUUID()}"
    Scratch.deleteOnExit(base)
    val rawDir = s"$base/raw"
    Files.createDirectories(Paths.get(rawDir))
    val cat = graft.catalog.GraftCatalog(s, base)
    val ingest = new RawToBronze(s, rawDir, cat.path("bronze"), s"$base/cki.json")
    val upsert = new BronzeToSilver(s, cat.path("bronze"), cat.path("silver"),
      s"$base/ckm.json")
    val t0 = System.currentTimeMillis() - 60000

    def writeBatch(name: String, rows: Seq[String], mtime: Long): Unit = {
      val p = Paths.get(rawDir, name)
      Files.write(p, (header +: rows).mkString("\n").getBytes("UTF-8"))
      p.toFile.setLastModified(mtime)
    }
    writeBatch("b1.tsv", batch1, t0)
    ingest.run(); upsert.run()
    writeBatch("b2.tsv", batch2, t0 + 30000)
    ingest.run(); upsert.run()

    assert(cat.sync() == Seq("bronze", "silver"),
      "catalog sync must discover the medallion tables")
    s.table("silver")
      .select(col("invoiceid"), col("itemid"), col("category"), col("price"),
        col("quantity"),
        date_format(col("orderdate"), "yyyy-MM-dd").as("order_date"),
        col("destinationstate"), col("shippingtype"), col("referral"),
        date_format(col("replicadmstimestamp"),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("cdc_ts"))
      .orderBy(col("invoiceid"))
  }

  val qPipelineCdcSql: String =
    """SELECT CAST(invoiceid AS BIGINT) AS invoiceid,
      |       CAST(itemid AS BIGINT) AS itemid, category,
      |       CAST(price AS DOUBLE) AS price, quantity, order_date,
      |       destinationstate, shippingtype, referral, cdc_ts
      |FROM (VALUES
      |  (15587, 59, 'bit',          40.94, 5, '2022-07-16', 'PW', '3-Day',    'management', '2024-08-20 17:16:03.213831'),
      |  (24137, 34, 'degree',       53.51, 1, '2023-03-29', 'SC', '3-Day',    'book',       '2024-02-16 15:30:41.041474'),
      |  (40994, 67, 'market####',   92.02, 1, '2021-05-21', 'VI', '2-Day',    'others',     '2024-06-27 14:36:25.103244'),
      |  (42918, 69, 'school',       27.23, 3, '2024-04-29', 'CT', '2-Day',    'trouble',    '2024-10-28 20:02:37.424182'),
      |  (83597, 37, 'language####', 97.07, 3, '2021-09-10', 'SC', 'Standard', 'play',       '2024-02-01 19:52:59.444793'))
      |  AS t(invoiceid, itemid, category, price, quantity, order_date,
      |       destinationstate, shippingtype, referral, cdc_ts)
      |ORDER BY invoiceid""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q_pipeline_cdc", qPipelineCdc, Some(qPipelineCdcSql)),
  )
}

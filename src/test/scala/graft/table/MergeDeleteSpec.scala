package graft.table

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.pipeline.{BronzeToSilver, RawToBronze}

/** The CDC-delete extension (SURVEY.md §2 N1: the reference never
  * interprets Op — we reproduce that by default and offer true deletes as
  * an opt-in). */
class MergeDeleteSpec extends SparkSpec {
  import spark.implicits._

  test("merge with opCol deletes matched keys, upserts the rest") {
    val t = GraftTable(spark, tmpDir("md-basic") + "/t")
    t.append(Seq((1L, "a", "CA"), (2L, "b", "NY"), (3L, "c", "TX"))
      .toDF("k", "v", "part"), parts = Seq("part"))
    val source = Seq(
      ("D", 2L, "ignored", "NY", 1L), // delete key 2
      ("U", 3L, "c2", "TX", 1L), // update key 3
      ("I", 4L, "d", "WA", 1L)) // insert key 4
      .toDF("Op", "k", "v", "part", "ts")
    t.merge(source, keys = Seq("k"), dedupKey = Seq("k"), orderCol = "ts",
      opCol = Some("Op"))
    val out = t.read().orderBy("k").select("k", "v").as[(Long, String)].collect()
    assert(out === Array((1L, "a"), (3L, "c2"), (4L, "d")))
  }

  test("keep-latest dedup wins over an earlier delete for the same key") {
    val t = GraftTable(spark, tmpDir("md-order") + "/t")
    t.append(Seq((1L, "a", "CA")).toDF("k", "v", "part"), parts = Seq("part"))
    val source = Seq(
      ("D", 1L, "x", "CA", 1L), // older delete
      ("U", 1L, "a2", "CA", 2L)) // newer update wins
      .toDF("Op", "k", "v", "part", "ts")
    t.merge(source, Seq("k"), Seq("k"), "ts", opCol = Some("Op"))
    assert(t.read().select("v").as[String].collect() === Array("a2"))
  }

  test("merge matches partitions for non-string partition columns") {
    // java.sql.Timestamp.toString renders '... 00:00:00.0' while the
    // partition dir decodes to '... 00:00:00'; if the affected-partition
    // probe compared toString output, matched rows would never be rewritten
    // and the upsert would silently duplicate the key.
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t = GraftTable(spark, tmpDir("md-tspart") + "/t")
    t.append(Seq((1L, ts, "a"), (2L, ts, "b")).toDF("k", "pt", "v"),
      parts = Seq("pt"))
    val source = Seq((1L, ts, "a2", 1L)).toDF("k", "pt", "v", "seq")
    t.merge(source, keys = Seq("k"), dedupKey = Seq("k"), orderCol = "seq")
    val out = t.read().orderBy("k").select("k", "v").as[(Long, String)].collect()
    assert(out === Array((1L, "a2"), (2L, "b"))) // upserted, not duplicated
  }

  test("delete for an absent key is a no-op insert-wise") {
    val t = GraftTable(spark, tmpDir("md-absent") + "/t")
    t.append(Seq((1L, "a", "CA")).toDF("k", "v", "part"), parts = Seq("part"))
    val source = Seq(("D", 99L, "x", "ZZ", 1L)).toDF("Op", "k", "v", "part", "ts")
    t.merge(source, Seq("k"), Seq("k"), "ts", opCol = Some("Op"))
    assert(t.read().count() === 1)
  }

  test("pipeline: default keeps reference semantics (D rows upserted), opt-in deletes") {
    val header = Seq("Op", "replicadmstimestamp", "invoiceid", "itemid",
      "category", "price", "quantity", "orderdate", "destinationstate",
      "shippingtype", "referral").mkString("\t")
    val insert =
      "I\t2024-01-01 10:00:00.000000\t1\t1\tbook\t5.0\t1\t2024-01-01\tCA\t2-Day\tweb"
    val delete =
      "D\t2024-01-02 10:00:00.000000\t1\t1\tbook\t5.0\t1\t2024-01-01\tCA\t2-Day\tweb"

    def run(interpretDeletes: Boolean): Long = {
      val base = tmpDir(s"md-pipe-$interpretDeletes")
      val rawDir = s"$base/raw"; Files.createDirectories(Paths.get(rawDir))
      val t0 = System.currentTimeMillis() - 60000
      val p1 = Paths.get(rawDir, "b1.tsv")
      Files.write(p1, (header + "\n" + insert).getBytes("UTF-8"))
      p1.toFile.setLastModified(t0)
      val ingest = new RawToBronze(spark, rawDir, s"$base/bronze", s"$base/cki.json")
      val upsert = new BronzeToSilver(spark, s"$base/bronze", s"$base/silver",
        s"$base/ckm.json", interpretDeletes = interpretDeletes)
      ingest.run(); upsert.run()
      val p2 = Paths.get(rawDir, "b2.tsv")
      Files.write(p2, (header + "\n" + delete).getBytes("UTF-8"))
      p2.toFile.setLastModified(t0 + 30000)
      ingest.run(); upsert.run()
      GraftTable(spark, s"$base/silver").read().count()
    }

    assert(run(interpretDeletes = false) === 1L) // reference: D upserts
    assert(run(interpretDeletes = true) === 0L) // extension: D deletes
  }
}

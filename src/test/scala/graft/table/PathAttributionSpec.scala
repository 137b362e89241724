package graft.table

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins file attribution by FULL table-relative path wherever a scan row
  * is mapped back to a table file. Spark's dynamic-partition writer gives
  * one task's files in different partition dirs IDENTICAL basenames
  * (part-00000-<jobUUID>...), so any basename-keyed map silently collapses
  * them — the SQL DELETE/UPDATE probe would rewrite the wrong file, and a
  * staged write's Bloom bitsets would be attributed to the wrong file
  * (point probes then prune a file that DOES contain a merge key). */
class PathAttributionSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  /** One task writing two partition dirs → colliding basenames. */
  private def collidingTable(prefix: String,
      props: Map[String, String] = Map.empty): (GraftTable, Seq[String]) = {
    import spark.implicits._
    val t = GraftTable(spark, tmpDir(prefix))
    val df: DataFrame = Seq(
      (1L, "v1", "a"), (2L, "v2", "a"), (3L, "v3", "b"), (4L, "v4", "b"))
      .toDF("k", "v", "p").coalesce(1)
    t.create(df.schema, parts = Seq("p"), properties = props)
    t.append(df)
    val live = t.liveFiles()
    assert(live.size == 2, s"expected one file per partition, got $live")
    val basenames = live.map(f => f.substring(f.lastIndexOf('/') + 1))
    assert(basenames.distinct.size == 1,
      s"fixture must produce colliding basenames, got $basenames")
    (t, live)
  }

  test("SQL DELETE rewrites the RIGHT file under cross-partition " +
      "basename collisions") {
    import spark.implicits._
    val (t, _) = collidingTable("collide-del")
    t.delete(col("k") === 1L)
    val rows = t.read().select("k", "v", "p").as[(Long, String, String)]
      .collect().toSet
    assert(rows == Set((2L, "v2", "a"), (3L, "v3", "b"), (4L, "v4", "b")))
  }

  test("SQL UPDATE hits matching rows under basename collisions") {
    import spark.implicits._
    val (t, _) = collidingTable("collide-upd")
    t.update(Map("v" -> lit("X")), Some(col("k") === 3L))
    val rows = t.read().select("k", "v").as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "v1"), (2L, "v2"), (3L, "X"), (4L, "v4")))
  }

  test("Bloom bitsets are attributed to the file that holds the values") {
    import org.apache.spark.sql.types.LongType
    val (t, live) = collidingTable("collide-bloom",
      props = Map("graft.bloom.columns" -> "k"))
    val stats = t.statsFor(live)
    val fa = live.find(_.contains("p=a")).get
    val fb = live.find(_.contains("p=b")).get
    // every file must carry a bloom, and the bloom must contain the keys
    // that file actually holds (a misattributed bitset answers false and
    // the merge point probe would skip the file → silent key duplication)
    for ((f, ks) <- Seq(fa -> Seq(1L, 2L), fb -> Seq(3L, 4L))) {
      val cs = stats.getOrElse(f, Map.empty).get("k")
      assert(cs.exists(_.bloom.isDefined), s"no bloom recorded for $f")
      ks.foreach(k => assert(
        FileStats.mayMatch(LongType, cs.get, "=", k),
        s"bloom of $f must contain its own key $k"))
    }
  }

  test("merge point probe stays correct on a bloom'd colliding table") {
    import spark.implicits._
    val (t, _) = collidingTable("collide-merge",
      props = Map("graft.bloom.columns" -> "k"))
    val batch = Seq((1L, "UP", "a"), (9L, "NEW", "b")).toDF("k", "v", "p")
    t.merge(batch, keys = Seq("k"), dedupKey = Seq("k"), orderCol = "k")
    val rows = t.read().select("k", "v").as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "UP"), (2L, "v2"), (3L, "v3"), (4L, "v4"),
      (9L, "NEW")))
    // no duplicate keys — the misattribution failure mode
    assert(t.read().groupBy("k").count().filter(col("count") > 1).count() == 0)
  }
}

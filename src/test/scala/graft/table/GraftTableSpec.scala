package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class GraftTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String) = GraftTable(spark, tmpDir(name) + "/t")

  test("create + append + read round-trips rows and schema") {
    val t = freshTable("gt-basic")
    val df = Seq((1L, "a", "p1"), (2L, "b", "p2"), (3L, "c", "p1"))
      .toDF("id", "v", "part")
    t.append(df, parts = Seq("part"))
    val back = t.read()
    assert(back.count() === 3)
    assert(back.columns.sorted === Array("id", "part", "v"))
    assert(back.filter($"part" === "p1").count() === 2)
    // schema preserved incl. partition column type
    assert(t.schema.fieldNames.toSeq === Seq("id", "v", "part"))
  }

  test("rewrites of tables declaring non-null array containers survive " +
      "(parquet reads elements back nullable; align must not cast to " +
      "the stricter container)") {
    val t = freshTable("gt-arraynn")
    // Seq[Float] encodes as array<float> containsNull=false — the exact
    // schema a vector corpus lands with
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 4.0f)),
      (3L, Seq(5.0f, 6.0f))).toDF("id", "v")
    assert(!df.schema("v").dataType
      .asInstanceOf[ArrayType].containsNull)
    t.append(df)
    t.delete(col("id") === 1L) // COW rewrite reads files back nullable
    assert(t.read().count() === 2)
    t.compact()
    assert(t.read().orderBy("id").select("v")
      .as[Seq[Float]].collect() === Array(Seq(3.0f, 4.0f), Seq(5.0f, 6.0f)))
    t.merge(Seq((2L, Seq(9.0f))).toDF("id", "v"), keys = Seq("id"),
      dedupKey = Seq("id"), orderCol = "id")
    assert(t.read().filter($"id" === 2L).select("v")
      .as[Seq[Float]].head() === Seq(9.0f))
  }

  test("nested struct/map columns survive the rewrite lifecycle " +
      "(stats skip non-stat types, align widens nested containers)") {
    val t = freshTable("gt-nested")
    // tuple → non-null struct fields; Map → valueContainsNull=false:
    // the strictest nullability shapes Scala encoders produce
    val df = Seq(
      (1L, ("a", 1), Map("k" -> 1.0)),
      (2L, ("b", 2), Map("k" -> 2.0)),
      (3L, ("c", 3), Map("k" -> 3.0)))
      .toDF("id", "s", "m")
    t.append(df)
    t.delete(col("id") === 2L)
    t.compact()
    t.merge(Seq((3L, ("z", 9), Map("k" -> 9.0))).toDF("id", "s", "m"),
      keys = Seq("id"), dedupKey = Seq("id"), orderCol = "id")
    val back = t.read().orderBy("id")
      .select($"id", $"s._1", $"s._2", $"m"("k"))
      .as[(Long, String, Int, Double)].collect()
    assert(back === Array((1L, "a", 1, 1.0), (3L, "z", 9, 9.0)))
  }

  test("snapshot isolation: appends create ordered snapshots; history view") {
    val t = freshTable("gt-snap")
    val mk = (i: Long) => Seq((i, s"row$i")).toDF("id", "v")
    t.append(mk(1))
    t.append(mk(2))
    t.append(mk(3))
    val ids = t.snapshots.map(_.snapshotId)
    assert(ids === Seq(0L, 1L, 2L, 3L)) // create + 3 appends
    val h = t.history
    assert(h.columns.contains("made_current_at"))
    assert(h.columns.contains("snapshot_id"))
    assert(h.count() === 4)
    // latest snapshot by made_current_at = O1 pattern
    val latest = h.orderBy($"made_current_at".desc, $"snapshot_id".desc)
      .limit(1).collect()(0).getAs[Long]("snapshot_id")
    assert(latest === 3L)
  }

  test("time travel reads exactly the as-of state") {
    val t = freshTable("gt-tt")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    val snap1 = t.latestSnapshotId.get
    t.append(Seq((2L, "b")).toDF("id", "v"))
    assert(t.read().count() === 2)
    assert(t.readAsOf(snap1).count() === 1)
    assert(t.readAsOf(snap1).select("v").as[String].collect() === Array("a"))
  }

  test("incremental read returns only rows appended in (start, end]") {
    val t = freshTable("gt-incr")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    val s1 = t.latestSnapshotId.get
    t.append(Seq((2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))
    val s3 = t.latestSnapshotId.get
    val inc = t.readIncremental(s1, s3)
    assert(inc.select("id").as[Long].collect().sorted === Array(2L, 3L))
    // empty range
    assert(t.readIncremental(s3, s3).count() === 0)
  }

  test("incremental read refuses ranges containing a merge/overwrite") {
    val t = freshTable("gt-incr-bad")
    t.append(Seq((1L, "a", "p")).toDF("id", "v", "part"), parts = Seq("part"))
    val s1 = t.latestSnapshotId.get
    t.merge(Seq((1L, "a2", "p")).toDF("id", "v", "part"),
      keys = Seq("id"), dedupKey = Seq("id"), orderCol = "id")
    val s2 = t.latestSnapshotId.get
    intercept[IllegalArgumentException] { t.readIncremental(s1, s2).count() }
  }

  test("overwrite replaces the live set but keeps old snapshots readable") {
    val t = freshTable("gt-ow")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    val s1 = t.latestSnapshotId.get
    t.overwrite(Seq((9L, "z")).toDF("id", "v"))
    assert(t.read().select("id").as[Long].collect() === Array(9L))
    assert(t.readAsOf(s1).select("id").as[Long].collect() === Array(1L))
  }

  test("merge upserts: matched rows fully replaced, unmatched inserted") {
    val t = freshTable("gt-merge")
    val target = Seq(
      (1L, 10L, "old-1", 1L, "CA"),
      (2L, 20L, "old-2", 1L, "NY"),
      (3L, 30L, "old-3", 1L, "TX")).toDF("k1", "k2", "v", "ts", "part")
    t.append(target, parts = Seq("part"))
    val source = Seq(
      (2L, 20L, "new-2", 2L, "NY"), // update
      (4L, 40L, "new-4", 2L, "WA")) // insert
      .toDF("k1", "k2", "v", "ts", "part")
    t.merge(source, keys = Seq("k1", "k2"), dedupKey = Seq("k1"),
      orderCol = "ts")
    val out = t.read().orderBy("k1").select("k1", "v").as[(Long, String)]
      .collect()
    assert(out === Array((1L, "old-1"), (2L, "new-2"), (3L, "old-3"),
      (4L, "new-4")))
  }

  test("merge dedups source keep-latest by order column before upserting") {
    val t = freshTable("gt-merge-dedup")
    t.append(Seq((1L, 1L, "orig", 0L, "CA")).toDF("k1", "k2", "v", "ts", "part"),
      parts = Seq("part"))
    val source = Seq(
      (1L, 1L, "stale", 5L, "CA"),
      (1L, 1L, "fresh", 9L, "CA")).toDF("k1", "k2", "v", "ts", "part")
    t.merge(source, keys = Seq("k1", "k2"), dedupKey = Seq("k1"),
      orderCol = "ts")
    assert(t.read().select("v").as[String].collect() === Array("fresh"))
  }

  test("merge only rewrites affected partitions (COW pruning)") {
    val t = freshTable("gt-merge-prune")
    val target = Seq(
      (1L, "a", "p1"), (2L, "b", "p2"), (3L, "c", "p3"))
      .toDF("id", "v", "part")
    t.append(target, parts = Seq("part"))
    val before = t.liveFiles().toSet
    t.merge(Seq((2L, "b2", "p2")).toDF("id", "v", "part"),
      keys = Seq("id"), dedupKey = Seq("id"), orderCol = "id")
    val after = t.liveFiles().toSet
    // p1 + p3 files untouched (carried by reference), p2 rewritten
    val untouched = before.filter(f => f.contains("part=p1") || f.contains("part=p3"))
    assert(untouched.subsetOf(after))
    assert(!after.exists(before.filter(_.contains("part=p2")).contains))
    assert(t.read().filter($"id" === 2L).select("v").as[String].collect() ===
      Array("b2"))
  }

  test("merge rewrites the old partition when an update moves a row") {
    val t = freshTable("gt-merge-move")
    t.append(Seq((1L, "a", "p1"), (2L, "b", "p2")).toDF("id", "v", "part"),
      parts = Seq("part"))
    // row 1 moves p1 -> p9
    t.merge(Seq((1L, "a-moved", "p9")).toDF("id", "v", "part"),
      keys = Seq("id"), dedupKey = Seq("id"), orderCol = "id")
    val out = t.read().orderBy("id").select("id", "part")
      .as[(Long, String)].collect()
    assert(out === Array((1L, "p9"), (2L, "p2"))) // no duplicate left in p1
  }

  test("merge is idempotent: re-merging the same batch is a no-op on data") {
    val t = freshTable("gt-merge-idem")
    t.append(Seq((1L, "x", 1L, "CA")).toDF("k", "v", "ts", "part"),
      parts = Seq("part"))
    val batch = Seq((1L, "y", 2L, "CA"), (2L, "z", 2L, "NY"))
      .toDF("k", "v", "ts", "part")
    t.merge(batch, Seq("k"), Seq("k"), "ts")
    val first = t.read().orderBy("k").collect().toSeq
    t.merge(batch, Seq("k"), Seq("k"), "ts")
    val second = t.read().orderBy("k").collect().toSeq
    assert(first === second)
  }

  test("partition-pruned read resolves files driver-side") {
    val t = freshTable("gt-pruned")
    t.append(Seq((1L, "p1"), (2L, "p2"), (3L, "p1")).toDF("id", "part"),
      parts = Seq("part"))
    val pruned = t.readPruned(Map("part" -> Set("p1")))
    assert(pruned.select("id").as[Long].collect().sorted === Array(1L, 3L))
    // the pruned scan's file list must be strictly smaller than the table's
    assert(pruned.inputFiles.length < t.read().inputFiles.length)
  }

  test("metadata views: .snapshots summary and .files scan-planning facts") {
    val t = freshTable("gt-meta")
    t.append(Seq((1L, "a", "p1"), (2L, "b", "p2")).toDF("id", "v", "part"),
      parts = Seq("part"))
    t.merge(Seq((2L, "b2", "p2")).toDF("id", "v", "part"),
      keys = Seq("id"), dedupKey = Seq("id"), orderCol = "id")
    val snaps = t.metaSnapshots.orderBy("snapshot_id").collect()
    assert(snaps.map(_.getAs[String]("operation")).toSeq ===
      Seq("create", "append", "merge"))
    assert(snaps(1).getAs[Long]("added_files") === 2L)
    val files = t.metaFiles.collect()
    assert(files.length === t.liveFiles().size)
    files.foreach { r =>
      assert(r.getAs[Long]("size_bytes") > 0L)
      assert(r.getAs[Long]("add_sequence") >= 1L)
      val part = r.getAs[Map[String, String]]("partition")
      assert(Set("p1", "p2").contains(part("part")))
      val lower = r.getAs[Map[String, String]]("lower_bounds")
      assert(lower.contains("id")) // snapshot-log column bounds surfaced
    }
  }

  test("empty table read returns empty frame with declared schema") {
    val t = freshTable("gt-empty")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("state", StringType)))
    t.create(schema, parts = Seq("state"))
    val df = t.read()
    assert(df.count() === 0)
    assert(df.schema.fieldNames.toSeq === Seq("id", "state"))
  }
}

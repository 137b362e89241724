package graft.table

import org.apache.hadoop.fs.Path
import graft.SparkSpec

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String) = GraftTable(spark, tmpDir(name) + "/t")

  test("compact merges small files, preserves data, blocks incremental reads") {
    val t = freshTable("mt-compact")
    (1 to 5).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    val before = t.read().orderBy("id").collect().toSeq
    assert(t.liveFiles().size >= 5)
    val s5 = t.latestSnapshotId.get
    t.compact(filesPerPartition = 1)
    assert(t.liveFiles().size === 1)
    assert(t.read().orderBy("id").collect().toSeq === before)
    // incremental scans refuse to cross the compaction (like Iceberg)
    intercept[IllegalArgumentException] {
      t.readIncremental(s5 - 1, t.latestSnapshotId.get)
    }
  }

  test("rollback restores an earlier state as a new snapshot") {
    val t = freshTable("mt-rollback")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    val s1 = t.latestSnapshotId.get
    t.append(Seq((2L, "b")).toDF("id", "v"))
    t.overwrite(Seq((9L, "z")).toDF("id", "v"))
    t.rollback(s1)
    assert(t.read().select("id").as[Long].collect() === Array(1L))
    // history preserved: the overwritten state is still reachable
    assert(t.readAsOf(3L).select("id").as[Long].collect() === Array(9L))
    assert(t.snapshots.last.operation === "rollback")
  }

  test("expireSnapshots truncates history and deletes unreachable files") {
    val t = freshTable("mt-expire")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.overwrite(Seq((2L, "b")).toDF("id", "v")) // file of snap 1 now dead
    t.append(Seq((3L, "c")).toDF("id", "v"))
    val deadFile = t.addedFilesOf(t.snapshots(1)).head
    val deleted = t.expireSnapshots(keepLast = 2)
    assert(deleted.contains(deadFile))
    assert(t.snapshots.map(_.snapshotId) === Seq(2L, 3L))
    // current state unchanged
    assert(t.read().select("id").as[Long].collect().sorted === Array(2L, 3L))
    // the dead file is physically gone
    val fs = new Path(t.location).getFileSystem(
      spark.sessionState.newHadoopConf())
    assert(!fs.exists(new Path(t.location, deadFile)))
    // old snapshots are no longer time-travelable
    assert(t.readAsOf(1L).count() === 0)
  }

  test("idempotent-writer txn stamps survive expire (baseline absorbs " +
      "them); a replay after truncation stays a no-op") {
    val t = freshTable("mt-expire-txn")
    t.append(Seq((1L, "a")).toDF("id", "v"), txn = Some(("sink", 7L)))
    // bury the stamped commit under unstamped ones, then expire it away
    (2L to 6L).foreach(i =>
      t.append(Seq((i, s"r$i")).toDF("id", "v")))
    t.expireSnapshots(keepLast = 2)
    assert(!t.snapshots.exists(_.txnAppId.contains("sink")),
      "precondition: the stamped snapshot itself must be expired")
    // the absorbed stamp still answers the replay check...
    assert(t.lastTxnBatch("sink").contains(7L))
    // ...so a crash-replay of batch 7 is STILL a no-op
    val rows = t.read().count()
    t.append(Seq((99L, "dup")).toDF("id", "v"), txn = Some(("sink", 7L)))
    assert(t.read().count() === rows, "replayed batch must not re-apply")
    // a genuinely newer batch commits
    t.append(Seq((100L, "new")).toDF("id", "v"), txn = Some(("sink", 8L)))
    assert(t.read().count() === rows + 1)
    assert(t.lastTxnBatch("sink").contains(8L))
    // a SECOND expire chains: the absorbed stamps carry forward
    (101L to 105L).foreach(i =>
      t.append(Seq((i, s"r$i")).toDF("id", "v")))
    t.expireSnapshots(keepLast = 2)
    assert(t.lastTxnBatch("sink").contains(8L))
  }

  test("expireOlderThan keeps age-qualified suffix; retain_last floors it") {
    val t = freshTable("mt-expire-age")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    Thread.sleep(5) // commits must straddle the millisecond cutoff
    t.append(Seq((2L, "b")).toDF("id", "v"))
    Thread.sleep(5)
    t.append(Seq((3L, "c")).toDF("id", "v"))
    // cutoff at the SECOND append's commit time: the create snapshot and
    // the first append are older and expire; the last two appends stay
    val appends = t.snapshots.filter(_.operation == "append")
    val keepIds = appends.tail.map(_.snapshotId)
    t.expireOlderThan(appends(1).timestampMs)
    assert(t.snapshots.map(_.snapshotId) === keepIds)
    assert(t.read().select("id").as[Long].collect().sorted ===
      Array(1L, 2L, 3L))
    // a far-future cutoff would expire everything — retainLast floors it
    t.expireOlderThan(Long.MaxValue, retainLast = 2)
    assert(t.snapshots.map(_.snapshotId) === keepIds)
  }

  test("CALL expire_snapshots accepts older_than_ms, rejects ambiguity") {
    val wh = tmpDir("mt-expire-call-wh")
    val cat = graft.catalog.GraftCatalog(spark, wh)
    val t = cat.table("mt_expire_call")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    Thread.sleep(5)
    t.append(Seq((2L, "b")).toDF("id", "v"))
    cat.register("mt_expire_call")
    val cutoff = t.snapshots.filter(_.operation == "append")
      .last.timestampMs
    spark.sql(
      s"CALL graft.expire_snapshots('mt_expire_call', older_than_ms => $cutoff)")
    assert(t.snapshots.size === 1)
    assert(t.read().count() === 2)
    val e = intercept[Exception] {
      spark.sql("CALL graft.expire_snapshots('mt_expire_call', " +
        "keep_last => 1, older_than_ms => 5)")
    }
    assert(e.getMessage.contains("exactly one"))
  }

  test("expire baseline carries fileRows for absorbed files") {
    val t = freshTable("mt-expire-rows")
    t.append(Seq((1L, "a"), (2L, "a")).toDF("id", "v"))
    t.append(Seq((3L, "b")).toDF("id", "v"))
    t.append(Seq((4L, "c")).toDF("id", "v"))
    val before = t.rowsFor(t.liveFiles())
    t.expireSnapshots(keepLast = 2) // baseline absorbs the first append
    val after = t.rowsFor(t.liveFiles())
    // row counts recorded by expired snapshots survive in the baseline —
    // metaFiles and auto-merge sizing keep working after expiration
    assert(after === before)
    assert(t.liveFiles().forall(after.contains))
    assert(after.values.sum === 4L)
  }

  test("compact(sortBy) re-clusters: fragmented appends regain pruned scans") {
    val dir = tmpDir("mt-recluster") + "/t"
    val t = GraftTable(spark, dir)
    // unclustered fragments: every file spans the full id range
    (0 until 4).foreach { k =>
      t.append((k.toLong until 4000L by 4).map(i => (i, s"v$i"))
        .toDF("id", "v").coalesce(1))
    }
    t.compact(filesPerPartition = 4, sortBy = Seq("id"))
    val live = t.liveFiles()
    assert(live.size === 4)
    // rewritten files have DISJOINT id bounds again
    val stats = t.statsFor(live)
    val ranges = live.map(f => (stats(f)("id").min.get.toLong,
      stats(f)("id").max.get.toLong)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2)
      case _ =>
    }
    assert(t.read().count() === 4000)
  }

  test("compact(where) rewrites only in-scope files; out-of-scope " +
      "partitions and their tombstones are untouched") {
    import org.apache.spark.sql.functions.col
    val t = freshTable("mt-compact-where")
    // two partitions, fragmented into 3 small files each
    (1 to 3).foreach { k =>
      t.append(Seq((k.toLong, "a", s"a$k"), (k + 10L, "b", s"b$k"))
        .toDF("id", "part", "v"), parts = Seq("part"))
    }
    // MOR tombstones against BOTH partitions
    t.merge(Seq((1L, "a", "a1-upd"), (11L, "b", "b1-upd"))
      .toDF("id", "part", "v"), Seq("id"), Seq("id"), "id", mode = "mor")
    val before = t.read().orderBy("id").collect().toSeq
    val bFiles = t.liveFiles().filter(_.contains("part=b")).toSet
    t.compact(where = Some(col("part") === "a"))
    // partition b's files survive byte-identical; a's are merged
    assert(t.liveFiles().filter(_.contains("part=b")).toSet === bFiles)
    assert(t.liveFiles().count(_.contains("part=a")) === 1)
    // tombstone files stay live (partition b still needs them) and the
    // read is unchanged — a's fold baked in, no double-apply
    assert(t.liveDeletes().nonEmpty)
    assert(t.read().orderBy("id").collect().toSeq === before)
    // a full compact afterwards retires the tombstones
    t.compact()
    assert(t.liveDeletes().isEmpty)
    assert(t.read().orderBy("id").collect().toSeq === before)
  }

  test("compact(where) scope is stats-pruned and no-ops on no match") {
    import org.apache.spark.sql.functions.col
    val t = freshTable("mt-compact-scope")
    // disjoint id ranges per file so min/max stats prune precisely
    t.append((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    t.append((101L to 200L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1))
    t.append((201L to 300L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1))
    val files = t.liveFiles().toSet
    val tip = t.latestSnapshotId.get
    // predicate outside every file's bounds: nothing rewritten, no commit
    assert(t.compact(where = Some(col("id") > 1000L)) === tip)
    assert(t.liveFiles().toSet === files)
    // predicate hitting one file's bounds rewrites exactly that file
    t.compact(where = Some(col("id") <= 50L))
    val after = t.liveFiles().toSet
    assert(after.intersect(files).size === 2) // two files untouched
    assert(t.read().count() === 300)
  }

  test("pruneDanglingDeletes retires inert tombstones, keeps applicable " +
      "ones; incremental reads cross the metadata commit") {
    import org.apache.spark.sql.functions.col
    val t = freshTable("mt-prune-dangling")
    (1 to 2).foreach { k =>
      t.append(Seq((k.toLong, "a", s"a$k"), (k + 10L, "b", s"b$k"))
        .toDF("id", "part", "v"), parts = Seq("part"))
    }
    // a position tombstone naming only partition-a files, and an
    // equality tombstone (applies to anything older by key)
    t.deletePositions(col("id") === 1L)
    t.merge(Seq((11L, "b", "b1-upd")).toDF("id", "part", "v"),
      Seq("id"), Seq("id"), "id", mode = "mor")
    assert(t.liveDeletes().size === 2)
    val before = t.read().orderBy("id").collect().toSeq
    // nothing dangles yet: both tombstones still apply
    val tip = t.latestSnapshotId.get
    assert(t.pruneDanglingDeletes() === tip)
    // scoped compact of partition a strands the position tombstone
    // (its named files are rewritten) but folds its effect in
    t.compact(where = Some(col("part") === "a"))
    assert(t.liveDeletes().size === 2) // scoped compact keeps both
    val pruned = t.pruneDanglingDeletes()
    assert(t.snapshots.last.operation === "prune-deletes")
    // the position tombstone is gone, the equality one (older b files
    // still live) survives
    val left = t.liveDeletes()
    assert(left.size === 1 && !left.head.isPosition)
    assert(t.read().orderBy("id").collect().toSeq === before)
    // incremental reads CROSS prune-deletes like any metadata commit:
    // a range starting before it and ending after the append refuses
    // only on real rewrites (the compact), not on the prune
    t.append(Seq((99L, "a", "late")).toDF("id", "part", "v"))
    val inc = t.readIncremental(pruned - 1, t.latestSnapshotId.get)
    assert(inc.select("id").as[Long].collect() === Array(99L))
  }

  test("compactToSize sizes output from manifest-recorded bytes") {
    val t = freshTable("mt-compact-size")
    (1 to 6).foreach(i =>
      t.append((1L to 2000L).map(j => (j, s"v$i-$j")).toDF("id", "v")
        .coalesce(1)))
    val total = t.liveFiles().map(f => t.bytesFor(Seq(f))(f)).sum
    assert(total > 0) // sizes recorded in the manifests
    // target = half the total → exactly 2 output files
    t.compactToSize(targetFileBytes = (total + 1) / 2)
    assert(t.liveFiles().size === 2)
    assert(t.read().count() === 12000)
  }

  test("compactSmallFiles binpacks ONLY undersized files; right-sized " +
      "files and partitions below the trigger are untouched") {
    val t = freshTable("mt-binpack")
    // one LARGE file (many rows) + several tiny single-row files
    t.append((1L to 3000L).map(i => (i, s"bulk$i")).toDF("id", "v"))
    val largeFile = t.liveFiles() match {
      case Seq(f) => f
      case fs => fs.maxBy(f => t.bytesFor(Seq(f)).getOrElse(f, 0L))
    }
    (1 to 4).foreach(i =>
      t.append(Seq((10000L + i, s"small$i")).toDF("id", "v")))
    val before = t.read().orderBy("id").collect().toSeq
    val nBefore = t.liveFiles().size

    // threshold sized between the tiny files and the bulk file
    val largeBytes = t.bytesFor(Seq(largeFile))(largeFile)
    val r = t.compactSmallFiles(targetFileBytes = largeBytes * 4,
      smallFileBytes = largeBytes)
    assert(r.isDefined)
    val after = t.liveFiles()
    // the large file survived UNREWRITTEN (same path in the live set)
    assert(after.contains(largeFile),
      "right-sized file must not be rewritten")
    // the 4 small files collapsed into fewer outputs
    assert(after.size < nBefore)
    assert(t.read().orderBy("id").collect().toSeq === before)

    // no partition meets minInputFiles → no commit at all
    val tip = t.latestSnapshotId
    assert(t.compactSmallFiles(targetFileBytes = largeBytes * 4,
      smallFileBytes = largeBytes).isEmpty)
    assert(t.latestSnapshotId === tip)

  }

  test("compactSmallFiles folds MOR tombstones of the rewritten subset " +
      "and leaves still-applicable deletes live") {
    val t = freshTable("mt-binpack-mor")
    t.append((1L to 2000L).map(i => (i, "bulk")).toDF("id", "v"))
    val largeFile = t.liveFiles().head
    (1 to 3).foreach(i =>
      t.append(Seq((5000L + i, s"s$i")).toDF("id", "v")))
    // MOR merge touches one small-file key AND one bulk key
    t.merge(Seq((5001L, "upd"), (7L, "upd7")).toDF("id", "v"),
      keys = Seq("id"), dedupKey = Seq("id"), orderCol = "id",
      mode = "mor")
    val before = t.read().orderBy("id").collect().toSeq
    val largeBytes = t.bytesFor(Seq(largeFile))(largeFile)
    assert(t.compactSmallFiles(targetFileBytes = largeBytes * 4,
      smallFileBytes = largeBytes).isDefined)
    // reads agree exactly; tombstones still apply to the untouched bulk
    assert(t.read().orderBy("id").collect().toSeq === before)
    assert(t.read().filter($"id" === 7L).select("v")
      .as[String].collect() === Array("upd7"))
    assert(t.read().filter($"id" === 5001L).select("v")
      .as[String].collect() === Array("upd"))
  }

  test("compactZOrder: fragmented appends regain MULTI-dimensional " +
      "pruning (both columns' per-file ranges tighten); CALL surface") {
    val t = freshTable("mt-zorder")
    // unclustered fragments: every file spans the full (x, y) space
    (0 until 4).foreach { k =>
      t.append((k until 4096 by 4).map { i =>
        (i.toLong, (i % 64).toLong, (i / 64).toLong) }
        .toDF("id", "x", "y").coalesce(1))
    }
    val before = t.read().orderBy("id").collect().toSeq
    def spans(fileSet: Seq[String]): Seq[(Long, Long)] = {
      val st = t.statsFor(fileSet)
      fileSet.map { f =>
        val sx = st(f)("x"); val sy = st(f)("y")
        (sx.max.get.toLong - sx.min.get.toLong,
          sy.max.get.toLong - sy.min.get.toLong)
      }
    }
    // before: each file spans ~the full 0..63 range on both dims
    assert(spans(t.liveFiles()).forall { case (dx, dy) =>
      dx >= 60 && dy >= 60 })
    t.compactZOrder(Seq("x", "y"), filesPerPartition = 16)
    assert(t.read().orderBy("id").collect().toSeq === before)
    // after: z-clustered files cover sub-rectangles — BOTH dims tighten
    // for most files (z-order trades a perfect single-dim sort for
    // bounded spans on every dim)
    val after = spans(t.liveFiles())
    assert(after.count { case (dx, dy) => dx <= 32 && dy <= 32 } >=
      after.size / 2, s"z-order did not tighten both dims: $after")

    // the same through SQL CALL
    val wh = tmpDir("mt-zorder-wh")
    val cat = graft.catalog.GraftCatalog(spark, wh)
    val t2 = cat.table("mt_zorder_sql")
    (0 until 3).foreach { k =>
      t2.append((k until 300 by 3).map(i =>
        (i.toLong, (i % 10).toLong)).toDF("id", "x").coalesce(1))
    }
    cat.register("mt_zorder_sql")
    spark.sql(
      "CALL graft.compact('mt_zorder_sql', zorder_by => 'id,x', " +
        "files_per_partition => 4)")
    assert(t2.snapshots.last.operation === "compact")
    assert(t2.read().count() === 300)
  }

  test("expire keeps everything when history is short; appends still work") {
    val t = freshTable("mt-expire-short")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    assert(t.expireSnapshots(keepLast = 5) === Seq.empty)
    t.append(Seq((2L, "b")).toDF("id", "v"))
    assert(t.read().count() === 2)
  }

  test("removeOrphanFiles deletes unreferenced parquet, keeps live data") {
    val t = freshTable("mt-orphan")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    // simulate a crashed writer: a stray parquet in the table dir
    val fs = new Path(t.location).getFileSystem(
      spark.sessionState.newHadoopConf())
    val stray = new Path(t.location, "part-stray-deadbeef.parquet")
    val out = fs.create(stray, true)
    out.write(Array[Byte](1, 2, 3)); out.close()
    // default 3-day guard: a fresh stray (possibly an in-flight writer's
    // staged file) is NOT touched
    assert(t.removeOrphanFiles() === Seq.empty)
    assert(fs.exists(stray))
    // explicit zero/negative threshold cleans it
    val deleted = t.removeOrphanFiles(olderThanMs = -1000)
    assert(deleted === Seq("part-stray-deadbeef.parquet"))
    assert(!fs.exists(stray))
    assert(t.read().count() === 1)
  }

  test("write-audit-publish: staged writes are invisible until published") {
    import org.apache.spark.sql.functions.col
    val t = freshTable("mt-wap")
    t.append(Seq((1L, "a")).toDF("id", "v"))

    val token = t.stagePending(Seq((2L, "b"), (3L, "BAD")).toDF("id", "v"))
    // invisible to every reader; auditable through the token
    assert(t.read().count() === 1)
    assert(t.readPending(token).count() === 2)
    // the orphan sweep must not eat files awaiting audit, even with no
    // age gate
    assert(t.removeOrphanFiles(olderThanMs = 0) === Seq.empty)

    // audit fails → discard; files and marker are gone
    t.discardPending(token)
    assert(t.read().count() === 1)
    intercept[IllegalArgumentException](t.readPending(token))

    // audit passes → publish; a normal append commit, stats included
    val token2 = t.stagePending(Seq((2L, "b")).toDF("id", "v"))
    val id = t.publishPending(token2)
    assert(t.latestSnapshotId.get === id)
    assert(t.snapshots.last.operation === "append")
    assert(t.read().orderBy("id").select("v").as[String].collect() ===
      Array("a", "b"))
    assert(t.statsFor(t.addedFilesOf(t.snapshots.last)).nonEmpty)
    // replayed publish is a no-op (token-keyed txn stamp)
    val t2 = GraftTable(spark, t.location)
    val token3 = t2.stagePending(Seq((9L, "z")).toDF("id", "v"))
    assert(t2.publishPending(token3) > id)
    assert(t2.read().filter(col("id") === 9L).count() === 1)
  }

  test("compactSmallFiles sizes outputs PER PARTITION GROUP: small files " +
      "spanning many partitions do not share one global file budget") {
    import org.apache.spark.sql.functions.input_file_name
    val t = freshTable("mt-binpack-parts")
    // two partitions, each with 4 tiny files
    (1 to 4).foreach { i =>
      t.append(Seq((i.toLong, "p1", s"a$i")).toDF("id", "part", "v"),
        parts = if (i == 1) Seq("part") else Seq.empty)
      t.append(Seq((100L + i, "p2", s"b$i")).toDF("id", "part", "v"))
    }
    assert(t.liveFiles().size === 8)
    val before = t.read().orderBy("id").collect().toSeq
    // a huge target: each GROUP should binpack to exactly ONE file —
    // the old global coalesce(1) would have produced one task writing
    // both dirs (still 2 files) but a global budget; per-group sizing
    // must give exactly ceil(groupBytes/target)=1 output per partition
    val r = t.compactSmallFiles(targetFileBytes = 64L * 1024 * 1024)
    assert(r.isDefined)
    val after = t.liveFiles()
    assert(after.size === 2, s"one output per partition group: $after")
    assert(after.count(_.contains("part=p1")) === 1)
    assert(after.count(_.contains("part=p2")) === 1)
    assert(t.read().orderBy("id").collect().toSeq === before)
    // a tiny target forces MULTIPLE outputs per group, still per-group:
    val t2 = freshTable("mt-binpack-parts2")
    (1 to 6).foreach { i =>
      t2.append((1L to 400L).map(j => (i * 1000L + j, "p1", s"v$j"))
        .toDF("id", "part", "v"),
        parts = if (i == 1) Seq("part") else Seq.empty)
    }
    val groupBytes = t2.bytesFor(t2.liveFiles()).values.sum
    val r2 = t2.compactSmallFiles(targetFileBytes = groupBytes / 3 + 1)
    assert(r2.isDefined)
    val n2 = t2.liveFiles().size
    assert(n2 >= 2 && n2 <= 4,
      s"~ceil(group/target)=3 outputs expected, got $n2")
  }
}

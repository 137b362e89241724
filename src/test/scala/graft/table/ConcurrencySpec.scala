package graft.table

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import graft.SparkSpec

/** Optimistic-commit behavior under concurrent writers: collisions on the
  * snapshot rename must retry against the new tip, never drop a commit. */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  test("concurrent appends all commit; snapshot chain is gapless") {
    val t = GraftTable(spark, tmpDir("conc-append") + "/t")
    t.create(Seq((0L, "")).toDF("id", "who").schema)
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = (1 to 4).map { w =>
      Future {
        (1 to 3).foreach { i =>
          t.append(Seq((w * 100L + i, s"writer$w")).toDF("id", "who"))
        }
      }
    }
    Await.result(Future.sequence(futures), 120.seconds)
    pool.shutdown()

    assert(t.read().count() === 12) // every append survived
    val ids = t.snapshots.map(_.snapshotId)
    assert(ids === (0L to 12L)) // create + 12 appends, no gaps, no dupes
    // parent chain is linear
    val parents = t.snapshots.drop(1).map(_.parentId.get)
    assert(parents === (0L to 11L))
  }

  test("append with a stale expectedParent conflicts instead of " +
      "publishing (CAS guard for check-then-append callers)") {
    val t = GraftTable(spark, tmpDir("conc-cas-append") + "/t")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    val tip = t.latestSnapshotId
    t.append(Seq((2L, "b")).toDF("id", "v")) // tip moves
    intercept[java.util.ConcurrentModificationException](
      t.append(Seq((3L, "c")).toDF("id", "v"), expectedParent = tip))
    // nothing published by the loser
    assert(t.read().count() === 2)
    // with the CURRENT tip the same append lands
    t.append(Seq((3L, "c")).toDF("id", "v"),
      expectedParent = t.latestSnapshotId)
    assert(t.read().count() === 3)
  }

  test("concurrent dedupAppend loops never double-commit a fingerprint " +
      "(probe+append is compare-and-swap, not check-then-act)") {
    val t = GraftTable(spark, tmpDir("conc-dedup-append") + "/t")
    // seed so both writers race against an existing corpus
    graft.operators.Dedup.dedupAppend(t,
      Seq((0L, "seed text zero")).toDF("doc_id", "text"), "doc_id", "text")
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // overlapping batches: ids 1-20 and 11-30 share texts 11-20 — at
    // most one loop may land each shared fingerprint
    def mk(lo: Int, hi: Int) =
      (lo to hi).map(i => (i.toLong, s"document body number $i"))
        .toDF("doc_id", "text")
    val fs = Seq(mk(1, 20), mk(11, 30)).map(b =>
      Future(graft.operators.Dedup.dedupAppend(t, b, "doc_id", "text")))
    val counts = Await.result(Future.sequence(fs), 120.seconds)
    pool.shutdown()
    assert(counts.sum === 30L, s"net novel rows must be 30, got $counts")
    val rows = t.read()
    assert(rows.count() === 31)
    assert(rows.select("fingerprint").distinct().count() === 31,
      "a fingerprint double-committed under concurrency")
  }

  test("COLD-START dedupAppend race: two loops racing the very first " +
      "batch still never double-commit (empty chain asserts a parentless " +
      "publish, not no-check)") {
    // no seeding: both writers may observe exists=false or an empty
    // snapshot chain — the regime where a plain expectedParent=tip
    // degrades to "no check" and overlapping fingerprints double-commit
    val t = GraftTable(spark, tmpDir("conc-dedup-cold") + "/t")
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    def mk(lo: Int, hi: Int) =
      (lo to hi).map(i => (i.toLong, s"cold start document $i"))
        .toDF("doc_id", "text")
    // ids 1-15 and 6-20 share texts 6-15
    val fs = Seq(mk(1, 15), mk(6, 20)).map(b =>
      Future(graft.operators.Dedup.dedupAppend(t, b, "doc_id", "text")))
    val counts = Await.result(Future.sequence(fs), 120.seconds)
    pool.shutdown()
    assert(counts.sum === 20L, s"net novel rows must be 20, got $counts")
    val rows = t.read()
    assert(rows.count() === 20)
    assert(rows.select("fingerprint").distinct().count() === 20,
      "a fingerprint double-committed in the cold-start race")
  }

  test("concurrent ACCUMULATING (read-modify-write) MOR merges never " +
      "lose an update: losers conflict, the final value equals the sum " +
      "of exactly the successful increments") {
    import org.apache.spark.sql.functions._
    val t = GraftTable(spark, tmpDir("conc-rmw-merge") + "/t")
    t.append(Seq((1L, 100L)).toDF("id", "n"))
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val increments = Seq(7L, 11L, 13L, 17L)
    val results = increments.map { inc =>
      Future {
        try {
          t.merge(Seq((1L, inc)).toDF("id", "n"),
            keys = Seq("id"), dedupKey = Seq("id"), orderCol = "id",
            mode = "mor",
            updateSet = Some(Seq(
              "n" -> (col("n") + graft.table.MergeInto.srcCol("n")))))
          Some(inc)
        } catch {
          case _: java.util.ConcurrentModificationException => None
        }
      }
    }
    val applied = Await.result(Future.sequence(results), 120.seconds)
      .flatten
    pool.shutdown()
    assert(applied.nonEmpty, "at least one merge must win")
    val finalN = t.read().select("n").as[Long].collect()(0)
    // the CAS property: exactly the winners' increments are in the
    // value — a silently lost update would make this sum disagree
    assert(finalN === 100L + applied.sum,
      s"lost/duplicated update: applied=$applied finalN=$finalN")
  }

  test("binpack maintenance racing a live ingest stream: appends always " +
      "land, the binpack either commits cleanly or conflicts — no row is " +
      "ever lost or duplicated") {
    val t = GraftTable(spark, tmpDir("conc-binpack") + "/t")
    (1 to 6).foreach(i =>
      t.append(Seq((i.toLong, s"seed$i")).toDF("id", "v")))
    val pool = Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val appender = Future {
      (100 to 110).foreach(i =>
        t.append(Seq((i.toLong, s"live$i")).toDF("id", "v")))
    }
    val binpacks = Future {
      (1 to 3).map { _ =>
        try { t.compactSmallFiles(targetFileBytes = 8L * 1024 * 1024); 1 }
        catch { case _: java.util.ConcurrentModificationException => 0 }
      }.sum
    }
    Await.result(appender, 120.seconds)
    val wins = Await.result(binpacks, 120.seconds)
    pool.shutdown()
    // every append landed regardless of maintenance interleaving
    val ids = t.read().select("id").as[Long].collect().sorted
    assert(ids === ((1L to 6L) ++ (100L to 110L)).toArray,
      s"maintenance raced away data: wins=$wins ids=${ids.mkString(",")}")
  }

  test("a rewrite whose base changed under it fails instead of corrupting") {
    val t = GraftTable(spark, tmpDir("conc-conflict") + "/t")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    // simulate: overwrite computed against the current tip, but an append
    // lands first — the stale overwrite must NOT commit its old file list
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // force interleaving deterministically: do it sequentially through the
    // API that validates the expected parent
    t.append(Seq((2L, "b")).toDF("id", "v"))
    // now run two overwrites concurrently — at most one may win
    val results = (1 to 2).map { i =>
      Future {
        try { t.overwrite(Seq((100L + i, "ow")).toDF("id", "v")); 1 }
        catch { case _: java.util.ConcurrentModificationException => 0 }
      }
    }
    val wins = Await.result(Future.sequence(results), 120.seconds).sum
    pool.shutdown()
    assert(wins >= 1) // at least one committed; losers errored, not corrupted
    // the table holds exactly one overwrite's row — never both
    assert(t.read().count() === 1)
  }

  test("concurrent mergeSchema appends keep both evolved columns") {
    // a retrying append must re-merge its schema against the winner's tip,
    // not republish the schema it computed before the collision — else the
    // winner's new column silently disappears from subsequent reads
    val t = GraftTable(spark, tmpDir("conc-schema") + "/t")
    t.create(Seq((0L, "")).toDF("id", "v").schema)
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val fs = Seq("x", "y").map { c =>
      Future {
        t.append(Seq((1L, "a", 1.0)).toDF("id", "v", c), mergeSchema = true)
      }
    }
    Await.result(Future.sequence(fs), 120.seconds)
    pool.shutdown()
    assert(t.schema.fieldNames.toSet === Set("id", "v", "x", "y"))
    assert(t.read().count() === 2)
  }

  test("concurrent MOR merges all commit (append-like retry, no conflicts)") {
    // a MOR merge removes nothing, so a publish collision retries against
    // the new tip instead of aborting — concurrent CDC upsert streams
    // must never kill each other; the result equals commit order
    val t = GraftTable(spark, tmpDir("conc-mor") + "/t")
    t.append((1L to 20L).map(i => (i, "base", 0L)).toDF("id", "v", "ts")
      .coalesce(1))
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = (1 to 4).map { w =>
      Future {
        // each worker upserts its own key range — all must land
        t.merge(Seq((w.toLong, s"writer$w", 1L), (100L + w, s"new$w", 1L))
          .toDF("id", "v", "ts"), keys = Seq("id"), dedupKey = Seq("id"),
          orderCol = "ts", mode = "mor")
      }
    }
    Await.result(Future.sequence(futures), 120.seconds)
    pool.shutdown()
    // every merge committed: chain is gapless, all updates+inserts visible
    assert(t.snapshots.map(_.snapshotId) === (0L to 5L)) // create+append+4
    assert(t.read().count() === 24)
    (1 to 4).foreach { w =>
      assert(t.read().filter($"id" === w.toLong).select("v").as[String]
        .collect() === Array(s"writer$w"))
      assert(t.read().filter($"id" === (100L + w)).count() === 1)
    }
  }

  test("concurrent replays of one txn batch commit at most once") {
    // the zombie-driver race: several replays of the SAME (appId, batchId)
    // pass the pre-staging check together (barrier), stage, and race the
    // publish — the in-retry-loop re-check must let exactly one commit
    // several contended batches, each raced by 4 barrier-synchronized
    // replayers: the original single-batch form caught the
    // check-then-parent-read ordering race (GraftTable.commit) only
    // rarely; looping widens the window enough to make a regression a
    // suite failure rather than a once-a-month flake
    val t = GraftTable(spark, tmpDir("conc-txn") + "/t")
    t.create(Seq((0L, "")).toDF("id", "v").schema)
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    (1 to 5).foreach { b =>
      val barrier = new java.util.concurrent.CyclicBarrier(4)
      val futures = (1 to 4).map { _ =>
        Future {
          barrier.await()
          t.append(Seq((b.toLong, "x")).toDF("id", "v"),
            txn = Some(("zombie", b.toLong)))
        }
      }
      Await.result(Future.sequence(futures), 120.seconds)
      assert(t.read().count() === b, s"batch $b landed more than once")
      assert(t.snapshots.count(s => s.txnAppId.contains("zombie") &&
        s.txnBatchId.contains(b.toLong)) === 1)
    }
    pool.shutdown()
  }

  test("lock-service commit path: concurrent appends all commit, no clobber") {
    // the S3A-shaped CommitLock (no atomic rename-or-fail; a lock service
    // serializes contenders) must give the same guarantees as the POSIX
    // link path: every append survives, the chain is gapless
    val before = GraftTable.commitLock
    GraftTable.commitLock = new LockServiceCommitLock()
    try {
      val t = GraftTable(spark, tmpDir("conc-lock") + "/t")
      t.create(Seq((0L, "")).toDF("id", "who").schema)
      val pool = Executors.newFixedThreadPool(4)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val futures = (1 to 4).map { w =>
        Future {
          (1 to 3).foreach { i =>
            t.append(Seq((w * 100L + i, s"writer$w")).toDF("id", "who"))
          }
        }
      }
      Await.result(Future.sequence(futures), 120.seconds)
      pool.shutdown()
      assert(t.read().count() === 12)
      assert(t.snapshots.map(_.snapshotId) === (0L to 12L))
      // and an occupied slot still refuses
      import org.apache.hadoop.fs.Path
      val conf = spark.sessionState.newHadoopConf()
      val fs = new Path(t.location).getFileSystem(conf)
      val tmp = new Path(t.location + "/_graft", ".tmp-loser.json")
      val out = fs.create(tmp, false)
      try out.write("LOSER".getBytes("UTF-8")) finally out.close()
      assert(!t.publishExclusive(tmp,
        new Path(t.location + "/_graft", "snap-00000001.json")))
    } finally GraftTable.commitLock = before
  }

  test("two sessions, one warehouse: B sees A's commits after refresh") {
    val wh = tmpDir("conc-2s")
    val sparkB = spark.newSession()
    val catA = graft.catalog.GraftCatalog(spark, wh)
    val catB = graft.catalog.GraftCatalog(sparkB, wh)
    catA.createFrom("conc_shared", Seq((1L, "a")).toDF("id", "v"))
    // B re-attaches from the warehouse layout alone
    assert(catB.sync().contains("conc_shared"))
    assert(sparkB.sql("SELECT id FROM conc_shared").count() === 1)
    // A appends AND evolves the schema; B refreshes → new snapshot, new
    // schema, no stale-schema window
    catA.append("conc_shared",
      Seq((2L, "b", 9.5)).toDF("id", "v", "score"), mergeSchema = true)
    catB.refresh("conc_shared")
    val out = sparkB.sql(
      "SELECT id, v, score FROM conc_shared ORDER BY id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(out(0).isNullAt(2)) // old row null-fills the evolved column
    assert(out(1).getDouble(2) === 9.5)
  }

  test("snapshot publish onto an occupied slot loses, never clobbers") {
    // LocalFileSystem.rename onto an existing file returns true and silently
    // OVERWRITES it — the exact primitive that would lose a racing commit.
    // publishExclusive must refuse instead.
    import org.apache.hadoop.fs.Path
    val dir = tmpDir("conc-publish")
    val t = GraftTable(spark, dir + "/t")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(conf)

    val dest = new Path(dir + "/t/_graft", "snap-occupied.json")
    val winner = fs.create(dest, false)
    try winner.write("WINNER".getBytes("UTF-8")) finally winner.close()

    val tmp = new Path(dir + "/t/_graft", ".tmp-loser.json")
    val out = fs.create(tmp, false)
    try out.write("LOSER".getBytes("UTF-8")) finally out.close()

    assert(!t.publishExclusive(tmp, dest)) // loser told the truth
    val in = fs.open(dest)
    val buf = new Array[Byte](fs.getFileStatus(dest).getLen.toInt)
    try in.readFully(buf) finally in.close()
    assert(new String(buf, "UTF-8") === "WINNER") // winner's commit intact
  }

  test("schema evolve racing appends: both commit, schema and rows survive") {
    val t = GraftTable(spark, tmpDir("conc-evolve") + "/t")
    t.create(Seq((0L, "")).toDF("id", "v").schema)
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // evolve commits race plain appends: both sides re-evaluate their
    // schema against the fresh tip inside the publish-retry loop, so no
    // interleaving may lose the added column OR an appended batch
    val appends = (1 to 3).map { w =>
      Future {
        (1 to 2).foreach { i =>
          t.append(Seq((w * 10L + i, s"w$w")).toDF("id", "v"))
        }
      }
    }
    val evolves = Seq(
      Future { t.addColumns(Seq(
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.DoubleType))) },
      Future { t.setProperties(Map("graft.note" -> "raced")) })
    Await.result(Future.sequence(appends ++ evolves), 120.seconds)
    pool.shutdown()

    assert(t.schema.fieldNames.toSeq === Seq("id", "v", "score"))
    assert(t.properties("graft.note") === "raced")
    assert(t.read().count() === 6) // every append survived the races
    // appends staged before the evolve won still read null-filled
    assert(t.read().filter(org.apache.spark.sql.functions.col("score")
      .isNull).count() === 6)
    // chain is gapless
    val ids = t.snapshots.map(_.snapshotId)
    assert(ids === (0L to ids.max))
  }

  test("z-order compact racing concurrent MOR merges (maintenance x " +
      "write): merges always land — retrying any CAS loser — the " +
      "compact commits cleanly or conflicts, and the final state is " +
      "exactly the last-writer-per-key model") {
    import org.apache.spark.sql.functions.col
    val t = GraftTable(spark, tmpDir("conc-zorder") + "/t")
    t.append((0L until 200L).map(i => (i, 0L)).toDF("id", "v"))
    val pool = Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // merges run SEQUENTIALLY in one thread so the per-key last writer
    // is deterministic; each retries on a CAS conflict (MOR merges are
    // append-like, but an accumulating/zorder interleave can still
    // surface a loser — the documented retry contract)
    val model = scala.collection.mutable.Map.empty[Long, Long]
    val merges = Future {
      (1 to 5).foreach { i =>
        val ids = (i * 17L until i * 17L + 40L).map(_ % 200L).distinct
        val batch = ids.map(id => (id, i * 1000L)).toDF("id", "v")
        var done = false
        var tries = 0
        while (!done) {
          tries += 1
          require(tries <= 10, "merge retry storm")
          try {
            t.merge(batch, keys = Seq("id"), dedupKey = Seq("id"),
              orderCol = "id", mode = "mor")
            done = true
          } catch {
            case _: java.util.ConcurrentModificationException => ()
          }
        }
        ids.foreach(id => model(id) = i * 1000L)
      }
    }
    val compacts = Future {
      (1 to 3).map { _ =>
        try { t.compactZOrder(Seq("id", "v")); 1 }
        catch { case _: java.util.ConcurrentModificationException => 0 }
      }.sum
    }
    Await.result(merges, 180.seconds)
    val wins = Await.result(compacts, 180.seconds)
    pool.shutdown()
    val got = t.read().select("id", "v").as[(Long, Long)]
      .collect().toSeq.sorted
    val want = (0L until 200L).map(id =>
      (id, model.getOrElse(id, 0L))).sorted
    assert(got === want,
      s"zorder/merge race lost or duplicated rows (compact wins=$wins)")
    // a quiesced compact still succeeds and preserves the state
    t.compactZOrder(Seq("id", "v"))
    assert(t.read().select("id", "v").as[(Long, Long)]
      .collect().toSeq.sorted === want)
  }

  test("expire racing an in-flight incremental reader: the pinned file " +
      "set stays readable and exact; a NEW reader over the absorbed " +
      "range gets a clean refusal, not wrong rows") {
    val t = GraftTable(spark, tmpDir("conc-expire") + "/t")
    t.append(Seq((1L, "s1")).toDF("id", "v")) // s1 (create+append)
    val s1 = t.latestSnapshotId.get
    t.append(Seq((2L, "s2")).toDF("id", "v"))
    val s2 = t.latestSnapshotId.get
    t.append(Seq((3L, "s3")).toDF("id", "v"))
    t.append(Seq((4L, "s4")).toDF("id", "v"))
    t.append(Seq((5L, "s5")).toDF("id", "v"))
    val s5 = t.latestSnapshotId.get
    // reader pins (s2, s5] BEFORE the expire: the file list is resolved
    // against the pre-expire chain
    val pinned = t.readIncremental(s2, s5)
    val before = pinned.select("id").as[Long].collect().sorted
    assert(before === Array(3L, 4L, 5L))
    // expire absorbs everything below the last two snapshots into the
    // baseline (including the reader's range start); append-only history
    // has no orphan files to release, but the chain must shrink
    t.expireSnapshots(keepLast = 2)
    assert(t.snapshots.size === 2)
    // the in-flight frame still reads its exact pinned rows — expire
    // absorbs METADATA; the files the reader resolved stay live in the
    // baseline (orphan sweeping only ever removes unreferenced files)
    assert(pinned.select("id").as[Long].collect().sorted === before)
    // a NEW incremental reader over the absorbed range refuses loudly
    // (the baseline is a rewrite-shaped commit, not an append) instead
    // of silently returning a wrong subset
    val e = intercept[IllegalArgumentException](
      t.readIncremental(s1, s5).collect())
    assert(e.getMessage.contains("incremental read over non-append"))
    // ranges fully inside the retained suffix still work
    val tipMinus = t.snapshots.dropRight(1).last.snapshotId
    assert(t.readIncremental(tipMinus, s5)
      .select("id").as[Long].collect() === Array(5L))
  }
}

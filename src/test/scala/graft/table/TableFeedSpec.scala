package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Exactly-once checkpointed table feeding (TableFeed): initial full
  * load, incremental-only rounds, and crash-replay deduplication via the
  * write-ahead pending range + idempotent txn stamps. */
class TableFeedSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String) = {
    val base = tmpDir(name)
    (GraftTable(spark, s"$base/src"), GraftTable(spark, s"$base/dst"),
      s"$base/feed.ckpt")
  }

  test("mirror: full initial load, then increments only") {
    val (src, dst, ckpt) = fresh("feed-basic")
    src.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // round 1: full state
    val r1 = TableFeed.mirror(src, dst, ckpt, "m1")
    assert(r1.isDefined)
    assert(dst.read().orderBy("id").collect() ===
      src.read().orderBy("id").collect())
    val dstSnapsAfter1 = dst.latestSnapshotId.get
    // nothing new → no round, no sink call, no dst commit
    assert(TableFeed.mirror(src, dst, ckpt, "m1") === None)
    assert(dst.latestSnapshotId.get === dstSnapsAfter1)
    // round 2: only the new append flows
    src.append(Seq((3L, "c")).toDF("id", "v"))
    val r2 = TableFeed.mirror(src, dst, ckpt, "m1")
    assert(r2.isDefined)
    assert(dst.read().count() === 3)
    assert(dst.read().orderBy("id").select("id").as[Long].collect() ===
      Array(1L, 2L, 3L))
  }

  test("zero-file metadata commits (evolve/properties) do not poison a feed") {
    val (src, dst, ckpt) = fresh("feed-evolve")
    src.append(Seq((1L, "a")).toDF("id", "v"))
    assert(TableFeed.mirror(src, dst, ckpt, "m1").isDefined)
    // schema evolve + property change land mid-feed: they add/remove no
    // files, so the next round must deliver the following append
    // normally — NOT trip the rewrite-recovery path
    src.addColumns(Seq(org.apache.spark.sql.types.StructField("score",
      org.apache.spark.sql.types.DoubleType)))
    src.setProperties(Map("graft.note" -> "mid-feed"))
    src.append(Seq((2L, "b", 0.5)).toDF("id", "v", "score"))
    val r = TableFeed.mirror(src, dst, ckpt, "m1")
    assert(r.isDefined)
    assert(dst.snapshots.last.operation === "append") // increment, not
    // a fullState overwrite (the rewrite-recovery path would overwrite)
    assert(dst.read().count() === 2)
  }

  test("crash between dst commit and checkpoint advance does not duplicate") {
    val (src, dst, ckpt) = fresh("feed-crash")
    src.append(Seq((1L, "a")).toDF("id", "v"))
    TableFeed.mirror(src, dst, ckpt, "m2")
    src.append(Seq((2L, "b")).toDF("id", "v"))

    // sink commits to dst (txn-stamped) then CRASHES before pump can mark
    // the range committed
    intercept[RuntimeException] {
      TableFeed.pump(src, ckpt) { (df: DataFrame, batchId: Long, _: Boolean) =>
        dst.append(df, txn = Some(("m2", batchId)))
        throw new RuntimeException("crash after dst commit")
      }
    }
    assert(dst.read().count() === 2) // the commit landed

    // replay: same range, same batch id → txn dedup makes it a no-op
    val snapsBefore = dst.latestSnapshotId.get
    val r = TableFeed.mirror(src, dst, ckpt, "m2")
    assert(r.isDefined) // the pending range was re-delivered
    assert(dst.latestSnapshotId.get === snapsBefore) // but nothing re-committed
    assert(dst.read().count() === 2)
    assert(dst.read().orderBy("id").select("id").as[Long].collect() ===
      Array(1L, 2L))
    // and the feed has moved on
    assert(TableFeed.mirror(src, dst, ckpt, "m2") === None)
  }

  test("crash BEFORE dst commit replays the range and delivers it") {
    val (src, dst, ckpt) = fresh("feed-crash-pre")
    src.append(Seq((1L, "a")).toDF("id", "v"))
    // crash before the sink does anything
    intercept[RuntimeException] {
      TableFeed.pump(src, ckpt) { (_, _, _) => throw new RuntimeException("boom") }
    }
    assert(!dst.exists) // nothing delivered
    // replay delivers the full range
    TableFeed.mirror(src, dst, ckpt, "m3")
    assert(dst.read().count() === 1)
  }

  test("feed over a source with pre-feed merges works; mid-feed rewrite recovers") {
    val (src, dst, ckpt) = fresh("feed-merge")
    src.append(Seq((1L, "a", 1L)).toDF("id", "v", "ts"))
    src.merge(Seq((1L, "a2", 2L)).toDF("id", "v", "ts"),
      Seq("id"), Seq("id"), "ts") // merge BEFORE the feed starts: fine
    TableFeed.mirror(src, dst, ckpt, "m4")
    assert(dst.read().select("v").as[String].collect() === Array("a2"))
    // a rewrite INSIDE the feed window: onRewrite=fail refuses and does
    // NOT advance the checkpoint...
    src.merge(Seq((1L, "a3", 3L)).toDF("id", "v", "ts"),
      Seq("id"), Seq("id"), "ts")
    intercept[IllegalArgumentException] {
      TableFeed.mirror(src, dst, ckpt, "m4", onRewrite = "fail")
    }
    assert(dst.read().select("v").as[String].collect() === Array("a2"))
    // ...and the default (fullState) then self-heals on the SAME persisted
    // pending range: full state re-delivered, mirror overwritten, in sync
    val r = TableFeed.mirror(src, dst, ckpt, "m4")
    assert(r.isDefined)
    assert(dst.read().select("v").as[String].collect() === Array("a3"))
    // feed is unwedged: subsequent appends flow incrementally again
    src.append(Seq((2L, "b", 4L)).toDF("id", "v", "ts"))
    TableFeed.mirror(src, dst, ckpt, "m4")
    assert(dst.read().orderBy("id").select("v").as[String].collect() ===
      Array("a3", "b"))
  }

  test("fullState replay after crash mid-recovery does not double-commit") {
    val (src, dst, ckpt) = fresh("feed-recover-crash")
    src.append(Seq((1L, "a", 1L)).toDF("id", "v", "ts"))
    TableFeed.mirror(src, dst, ckpt, "m5")
    src.merge(Seq((1L, "a2", 2L)).toDF("id", "v", "ts"),
      Seq("id"), Seq("id"), "ts")
    // recovery overwrite lands in dst, then the pump crashes before the
    // checkpoint advances — the replay must dedup via the txn stamp
    intercept[RuntimeException] {
      TableFeed.pump(src, ckpt, onRewrite = "fullState") { (df, batchId, full) =>
        assert(full)
        dst.overwrite(df, txn = Some(("m5", batchId)))
        throw new RuntimeException("crash after overwrite")
      }
    }
    val snaps = dst.latestSnapshotId.get
    TableFeed.mirror(src, dst, ckpt, "m5")
    assert(dst.latestSnapshotId.get === snaps) // replay was a no-op
    assert(dst.read().select("v").as[String].collect() === Array("a2"))
  }
}

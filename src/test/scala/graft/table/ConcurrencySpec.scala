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
}

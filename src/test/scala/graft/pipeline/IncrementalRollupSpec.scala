package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.table.GraftTable

/** Incrementally-maintained aggregates: dst == full GROUP BY recompute
  * after every maintenance round, across every commit type the changelog
  * nets out (append, MOR merge update/insert, COW delete); exactly-once
  * via the destination's own txn stamp — no external checkpoint. */
class IncrementalRollupSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String) = GraftTable(spark, tmpDir(name) + "/t")

  private def recompute(src: GraftTable) =
    src.read().groupBy("g")
      .agg(sum(col("v")).as("v_sum"), count(lit(1)).as("n"))

  private def dstRows(dst: GraftTable) =
    dst.read().select("g", "v_sum", "n")
      .orderBy("g").as[(String, Long, Long)].collect()

  test("maintain applies append/merge/delete deltas; dst equals the " +
      "recompute after every round") {
    val src = fresh("roll-src")
    val dst = fresh("roll-dst")
    src.append(Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 30L))
      .toDF("g", "id", "v"))
    val r1 = IncrementalRollup.maintain(src, dst, Seq("g"), Seq("v"), "x")
    assert(r1.isDefined)
    assert(dstRows(dst) === Array(("a", 30L, 2L), ("b", 30L, 1L)))

    // append a new group + MOR-update an existing row + delete one
    src.append(Seq(("c", 4L, 5L)).toDF("g", "id", "v"))
    src.merge(Seq(("a", 2L, 100L)).toDF("g", "id", "v"),
      keys = Seq("id"), dedupKey = Seq("id"), orderCol = "id",
      mode = "mor")
    src.delete(col("id") === 3L) // group b drops to zero rows
    val r2 = IncrementalRollup.maintain(src, dst, Seq("g"), Seq("v"), "x")
    assert(r2.isDefined && r2.get._1 === r1.get._2)
    // b LEFT the aggregate (no zero-count residue); a re-netted
    assert(dstRows(dst) === Array(("a", 110L, 2L), ("c", 5L, 1L)))
    assert(dstRows(dst).map(r => (r._1, r._2, r._3)).toSeq ===
      recompute(src).orderBy("g").as[(String, Long, Long)].collect().toSeq)

    // up to date: nothing to apply
    assert(IncrementalRollup.maintain(src, dst, Seq("g"), Seq("v"), "x")
      .isEmpty)
  }

  test("crash-replay of a committed range is a no-op (txn stamp)") {
    val src = fresh("roll-replay-src")
    val dst = fresh("roll-replay-dst")
    src.append(Seq(("a", 1L, 10L)).toDF("g", "id", "v"))
    IncrementalRollup.maintain(src, dst, Seq("g"), Seq("v"), "x")
    val tip = src.latestSnapshotId.get
    assert(dst.lastTxnBatch("x").contains(tip))
    val snapsBefore = dst.snapshots.size
    // a replayed sink call with the SAME (appId, batchId) — the crashed-
    // between-merge-and-ack scenario — must not double-apply, even with
    // a poisoned delta
    dst.merge(Seq(("a", 999999L, 9L, 1L)).toDF("g", "v_sum", "v_nncnt", "n"),
      keys = Seq("g"), dedupKey = Seq("g"), orderCol = "g",
      txn = Some(("x", tip)))
    assert(dst.snapshots.size === snapsBefore) // no new commit
    assert(dstRows(dst) === Array(("a", 10L, 1L)))
    // a LATER batch under the same app id still commits
    src.append(Seq(("a", 2L, 5L)).toDF("g", "id", "v"))
    IncrementalRollup.maintain(src, dst, Seq("g"), Seq("v"), "x")
    assert(dstRows(dst) === Array(("a", 15L, 2L)))
  }

  test("independent app ids maintain independent high-water marks") {
    val src = fresh("roll-multi-src")
    src.append(Seq(("a", 1L, 10L)).toDF("g", "id", "v"))
    val d1 = fresh("roll-multi-d1")
    val d2 = fresh("roll-multi-d2")
    IncrementalRollup.maintain(src, d1, Seq("g"), Seq("v"), "one")
    src.append(Seq(("a", 2L, 20L)).toDF("g", "id", "v"))
    // d2 starts late: its first round absorbs the full history
    IncrementalRollup.maintain(src, d2, Seq("g"), Seq("v"), "two")
    IncrementalRollup.maintain(src, d1, Seq("g"), Seq("v"), "one")
    assert(dstRows(d1) === dstRows(d2))
  }

  private def recomputeMM(src: GraftTable) =
    src.read().groupBy("g")
      .agg(sum(col("v")).as("v_sum"), min(col("v")).as("v_min"),
        max(col("v")).as("v_max"), count(lit(1)).as("n"))
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq

  private def mmRows(dst: GraftTable) =
    dst.read().select("g", "v_sum", "v_min", "v_max", "n")
      .orderBy("g").as[(String, Long, Long, Long, Long)]
      .collect().toSeq

  private def maintainMM(src: GraftTable, dst: GraftTable): Unit =
    IncrementalRollup.maintain(src, dst, Seq("g"), Seq("v"), "mm",
      minCols = Seq("v"), maxCols = Seq("v"))

  test("MIN/MAX: insert-only rounds fold delta extremes; a retracted " +
      "extremum is recovered by re-aggregating only affected groups") {
    val src = fresh("roll-mm-src")
    val dst = fresh("roll-mm-dst")
    src.append(Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 30L),
      ("b", 4L, 40L)).toDF("g", "id", "v"))
    maintainMM(src, dst)
    assert(mmRows(dst) === Seq(("a", 30L, 10L, 20L, 2L),
      ("b", 70L, 30L, 40L, 2L)))

    // insert-only: new max folds in via greatest(), no retraction
    src.append(Seq(("a", 5L, 99L)).toDF("g", "id", "v"))
    maintainMM(src, dst)
    assert(mmRows(dst) === recomputeMM(src))
    assert(mmRows(dst).head === (("a", 129L, 10L, 99L, 3L)))

    // the KEY case: delete the group's max — delta alone cannot recover
    // the next-best extremum; the bounded re-aggregation must
    src.delete(col("id") === 5L)
    maintainMM(src, dst)
    assert(mmRows(dst) === recomputeMM(src))
    assert(mmRows(dst).head === (("a", 30L, 10L, 20L, 2L)))

    // an update (= delete+insert in the changelog) that LOWERS b's max
    // row: both the retraction and the new value must net correctly
    src.merge(Seq(("b", 4L, 5L)).toDF("g", "id", "v"),
      keys = Seq("id"), dedupKey = Seq("id"), orderCol = "id",
      mode = "mor")
    maintainMM(src, dst)
    assert(mmRows(dst) === recomputeMM(src))
    assert(mmRows(dst)(1) === (("b", 35L, 5L, 30L, 2L)))

    // a group retracted to zero rows leaves the aggregate entirely
    src.delete(col("g") === "b")
    maintainMM(src, dst)
    assert(mmRows(dst) === Seq(("a", 30L, 10L, 20L, 2L)))
    assert(mmRows(dst) === recomputeMM(src))
  }

  test("sum-of-squares maintenance: second moments stay delta-safe " +
      "through inserts AND retractions (no re-aggregation path needed)") {
    val src = fresh("roll-sq-src")
    val dst = fresh("roll-sq-dst")
    def m(): Unit = { IncrementalRollup.maintain(src, dst, Seq("g"),
      Seq("v"), "x", sumSqCols = Seq("v")); () }
    def want() = src.read().groupBy("g")
      .agg(sum(col("v")).as("v_sum"),
        sum(col("v") * col("v")).as("v_sumsq"),
        count(lit(1)).as("n")).orderBy("g")
      .as[(String, Long, Long, Long)].collect().toSeq
    def got() = dst.read().select("g", "v_sum", "v_sumsq", "n")
      .orderBy("g").as[(String, Long, Long, Long)].collect().toSeq

    src.append(Seq(("a", 1L, 3L), ("a", 2L, 5L), ("b", 3L, 7L))
      .toDF("g", "id", "v"))
    m(); assert(got() === want())
    src.append(Seq(("a", 4L, 11L), ("c", 5L, 2L)).toDF("g", "id", "v"))
    src.delete(col("id") === 2L) // retract a² from the running sumsq
    m(); assert(got() === want())
    assert(got().find(_._1 == "a").get === (("a", 14L, 130L, 2L)))
  }

  test("maintenance across a SOURCE schema-evolve boundary: pre-evolve " +
      "rows null-fill the new column and contribute nothing to its sums " +
      "(asserted, not assumed); n still counts them") {
    val src = fresh("roll-evolve-src")
    val dst = fresh("roll-evolve-dst")
    // history: 3 rows WITHOUT w → evolve adds w → 2 rows WITH w
    src.append(Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 30L))
      .toDF("g", "id", "v"))
    src.addColumns(Seq(org.apache.spark.sql.types.StructField("w",
      org.apache.spark.sql.types.LongType, nullable = true)))
    src.append(Seq(("a", 4L, 5L, 100L), ("c", 5L, 7L, 200L))
      .toDF("g", "id", "v", "w"))

    // ONE maintenance round spanning the evolve commit: the changelog
    // range mixes schemas; pre-evolve inserts read with w = null
    val r = IncrementalRollup.maintain(src, dst, Seq("g"), Seq("v", "w"),
      "x")
    assert(r.isDefined)
    def got() = dst.read().select("g", "v_sum", "w_sum", "n")
      .orderBy("g").as[(String, Long, Option[Long], Long)].collect().toSeq
    // group a: v sums ALL three rows; w sums only the post-evolve row
    assert(got() === Seq(("a", 35L, Some(100L), 3L), ("b", 30L, None, 1L),
      ("c", 7L, Some(200L), 1L)))
    // ... and equals the one-shot recompute (SUM skips nulls there too)
    val want = src.read().groupBy("g")
      .agg(sum(col("v")).as("v_sum"), sum(col("w")).as("w_sum"),
        count(lit(1)).as("n")).orderBy("g")
      .as[(String, Long, Option[Long], Long)].collect().toSeq
    assert(got() === want)

    // incremental rounds AFTER the boundary keep netting correctly,
    // including a retraction of a group's ONLY w row — which must take
    // its w_sum back to SQL's all-null answer (NULL, not a stale 0)
    src.append(Seq(("b", 6L, 1L, 50L)).toDF("g", "id", "v", "w"))
    src.delete(col("id") === 4L) // retract a's only w row
    assert(IncrementalRollup.maintain(src, dst, Seq("g"), Seq("v", "w"),
      "x").isDefined)
    assert(got() === Seq(("a", 30L, None, 2L), ("b", 31L, Some(50L), 2L),
      ("c", 7L, Some(200L), 1L)))
    val want2 = src.read().groupBy("g")
      .agg(sum(col("v")).as("v_sum"), sum(col("w")).as("w_sum"),
        count(lit(1)).as("n")).orderBy("g")
      .as[(String, Long, Option[Long], Long)].collect().toSeq
    assert(got() === want2)
  }

  test("DECIMAL overflow in a delta aggregate fails LOUD under non-ANSI " +
      "mode instead of silently zeroing the sumsq state") {
    val src = fresh("roll-ovf-src")
    val dst = fresh("roll-ovf-dst")
    // 10^19 as DECIMAL(38,0): v*v = 10^38 overflows Decimal(38) — ANSI
    // throws at the multiply; non-ANSI yields NULL, which the combine's
    // coalesce(...,0) would have silently treated as a zero delta
    src.append(Seq(("a", 1L)).toDF("g", "id")
      .withColumn("v", lit("10000000000000000000").cast("decimal(38,0)")))
    val ansiWas = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val e = intercept[IllegalArgumentException](
        IncrementalRollup.maintain(src, dst, Seq("g"), Seq.empty, "x",
          sumSqCols = Seq("v")))
      assert(e.getMessage.contains("overflowed"))
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiWas)
  }

  test("COUNT(DISTINCT) maintenance: insert rounds union-merge the KMV " +
      "state; a retraction re-aggregates only affected groups; dst " +
      "equals the one-shot sketch after every round") {
    import graft.functions.AggExpressions.kmv_sketch
    import graft.functions.HashExpressions.md5_hash64
    val src = fresh("roll-dist-src")
    val dst = fresh("roll-dist-dst")
    val k = 8 // small k so the estimator path (not just exact-below-k) runs

    def oneShot(): Array[(String, Seq[Long], Long)] =
      src.read().groupBy("g")
        .agg(kmv_sketch(md5_hash64(col("u").cast("string")), k).as("sk"))
        .orderBy("g").as[(String, Seq[Long])].collect()
        .map { case (g, sk) => (g, sk, sk.size.toLong) }
    def maintained(): Array[(String, Seq[Long], Long)] =
      dst.read().select("g", "u_distinct_sk")
        .orderBy("g").as[(String, Seq[Long])].collect()
        .map { case (g, sk) => (g, sk, sk.size.toLong) }
    def check(): Unit = assert(maintained() === oneShot())

    // round 1: create + initial state; group a exceeds k distinct users
    src.append((1L to 20L).map(u => ("a", u, 1L)).toDF("g", "u", "v") union
      Seq(("b", 1L, 1L), ("b", 2L, 1L)).toDF("g", "u", "v"))
    IncrementalRollup.maintain(src, dst, Seq("g"), Seq("v"), "x",
      distinctCols = Seq("u"), distinctK = k)
    check()
    // estimate column matches the summary aggregate's est exactly
    val est = dst.read().filter(col("g") === "b")
      .select("u_distinct_est").as[Double].head()
    assert(est === 2.0) // below k: exact

    // round 2: insert-only — new users, repeated users, a new group
    src.append(Seq(("a", 21L, 1L), ("a", 1L, 1L), ("b", 3L, 1L),
      ("c", 9L, 1L)).toDF("g", "u", "v"))
    IncrementalRollup.maintain(src, dst, Seq("g"), Seq("v"), "x",
      distinctCols = Seq("u"), distinctK = k)
    check()

    // round 3: retraction — delete some of group a's rows (including
    // bottom-k members, which no sketch can un-count) → bounded re-agg
    src.delete(col("g") === "a" && col("u") <= 10L)
    IncrementalRollup.maintain(src, dst, Seq("g"), Seq("v"), "x",
      distinctCols = Seq("u"), distinctK = k)
    check()

    // replay safety: an identical maintain call is a no-op
    assert(IncrementalRollup.maintain(src, dst, Seq("g"), Seq("v"), "x",
      distinctCols = Seq("u"), distinctK = k).isEmpty)
  }

  test("null-keyed groups fail LOUD: every downstream key match is " +
      "SQL-equality, where a null-keyed dst row could never update") {
    val src = fresh("roll-nullkey-src")
    val dst = fresh("roll-nullkey-dst")
    src.append(Seq(("a", 1L, 10L), (null, 2L, 20L))
      .toDF("g", "id", "v"))
    val e = intercept[IllegalArgumentException](
      IncrementalRollup.maintain(src, dst, Seq("g"), Seq("v"), "x"))
    assert(e.getMessage.contains("NULL"))
    // non-null groups maintain fine once the nulls are filtered upstream
    val clean = fresh("roll-nullkey-clean")
    clean.append(src.read().filter(col("g").isNotNull))
    IncrementalRollup.maintain(clean, dst, Seq("g"), Seq("v"), "x")
    assert(dstRows(dst) === Array(("a", 10L, 1L)))
  }

  test("maintain with a different aggregate spec than dst was built " +
      "with fails loud") {
    val src = fresh("roll-spec-src")
    val dst = fresh("roll-spec-dst")
    src.append(Seq(("a", 1L, 10L)).toDF("g", "id", "v"))
    IncrementalRollup.maintain(src, dst, Seq("g"), Seq("v"), "x")
    src.append(Seq(("a", 2L, 20L)).toDF("g", "id", "v"))
    val e = intercept[IllegalArgumentException] {
      IncrementalRollup.maintain(src, dst, Seq("g"), Seq("v"), "x",
        minCols = Seq("v"))
    }
    assert(e.getMessage.contains("v_min"))
  }
}

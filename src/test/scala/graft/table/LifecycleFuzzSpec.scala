package graft.table

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Randomized lifecycle fuzz (fixed seed — deterministic, not flaky):
  * a random sequence of COW merges, MOR merges, predicate deletes,
  * position deletes, position updates, and compactions runs against BOTH
  * the table and a trivial in-memory reference model; after EVERY op the
  * table's full read must equal the model. At the end, the CDC changelog
  * over the whole history is replayed (deletes then inserts per commit,
  * in commit order) and must reconstruct the exact final state — the
  * cross-check that every commit type's net change set is consistent
  * with its effect on reads, under arbitrary interleavings no
  * hand-written spec enumerates. Every 5th op additionally runs
  * incremental ROLLUP MAINTENANCE (sum/sumsq/min/max/KMV-distinct over
  * a derived group key) against the fuzzed history and asserts the
  * maintained aggregate equals a full recompute — the maintenance
  * machinery exercised over op interleavings (merge/delete/update/
  * compact/WAP) its own specs never enumerate. */
class LifecycleFuzzSpec extends SparkSpec {
  import spark.implicits._

  for (seed <- Seq(4242, 907, 31337))
  test(s"24 random lifecycle ops (seed $seed) match the reference model " +
      "after every op; changelog replay reconstructs the final state") {
    val rnd = new scala.util.Random(seed)
    val t = GraftTable(spark, tmpDir(s"fuzz-$seed") + "/t")
    // model: id -> (ord, v, w, f) — w is None until the mid-fuzz schema
    // evolve lands and for every row whose write predates it; f is a
    // FLOAT column present from the seed, type-widened to double by the
    // deterministic op-14 evolve (the r11 float→double promotion under
    // fuzzed interleavings — stat re-rendering must keep pruning sound
    // across every later merge/delete/compact)
    var model = Map.empty[Long, (Long, Long, Option[Long], Float)]
    var ord = 0L
    var evolved = false
    var widened = false
    // float MULTIPLY (Spark keeps float×float at float; division would
    // silently promote the column to double) — 0.1f makes most values
    // non-exact decimals, so the widen's stat re-rendering is exercised
    def fOf(o: Long): Float = (o % 97).toFloat * 0.1f
    // post-evolve merge batches carry w (the merge path requires the
    // exact target column set); derived from ord so it's deterministic
    def withW(df0: org.apache.spark.sql.DataFrame) = {
      val df = df0.withColumn("f",
        pmod(col("ord"), lit(97L)).cast("float") * lit(0.1f))
      if (evolved) df.withColumn("w", pmod(col("ord"), lit(7L))) else df
    }

    def mergeOp(mode: String): Unit = {
      val ids = rnd.shuffle((0L until 200L).toList)
        .take(5 + rnd.nextInt(25))
      val rows = ids.map { id => ord += 1; (id, ord, rnd.nextInt(100000).toLong) }
      t.merge(withW(rows.toDF("id", "ord", "v")
        .withColumn("g", pmod(col("id"), lit(5L)))), keys = Seq("id"),
        dedupKey = Seq("id"), orderCol = "ord", mode = mode)
      rows.foreach { case (id, o, v) =>
        model += id -> (o, v, if (evolved) Some(o % 7) else None, fOf(o)) }
    }
    def deleteOp(positional: Boolean): Unit = {
      val m = 3 + rnd.nextInt(5); val r = rnd.nextInt(m)
      val pred = col("id") % m === r
      if (positional) t.deletePositions(pred) else t.delete(pred)
      model = model.filterNot { case (id, _) => id % m == r }
    }
    // round-10 ops: conditional partial-update merge (the full MERGE
    // matrix under interleavings) and the two maintenance rewrites
    def partialMergeOp(mode: String): Unit = {
      val ids = rnd.shuffle((0L until 200L).toList)
        .take(5 + rnd.nextInt(15))
      val rows = ids.map { id =>
        ord += 1; (id, ord, rnd.nextInt(100000).toLong) }
      t.merge(withW(rows.toDF("id", "ord", "v")
        .withColumn("g", pmod(col("id"), lit(5L)))), keys = Seq("id"),
        dedupKey = Seq("id"), orderCol = "ord", mode = mode,
        // accumulate v and take the new ord ONLY when the source v is
        // even; odd-v matches keep the target row byte-identical; w
        // (post-evolve) stays unassigned — matched rows keep theirs
        updateSet = Some(Seq(
          "v" -> (col("v") + MergeInto.srcCol("v")),
          "ord" -> MergeInto.srcCol("ord"),
          "g" -> col("g"))),
        updateCond = Some(MergeInto.srcCol("v") % 2 === 0))
      rows.foreach { case (id, o, v) =>
        model.get(id) match {
          case Some((_, oldV, oldW, oldF)) if v % 2 == 0 =>
            // f unassigned by the partial update: target value KEPT
            model += id -> (o, oldV + v, oldW, oldF)
          case Some(_) => () // condition failed: target row unchanged
          case None =>
            model += id -> (o, v, if (evolved) Some(o % 7) else None,
              fOf(o))
        }
      }
    }
    def binpackOp(): Unit = {
      // data-preserving; may legitimately no-op below the trigger
      t.compactSmallFiles(targetFileBytes = 4L * 1024 * 1024)
      ()
    }
    def zorderOp(): Unit = { t.compactZOrder(Seq("id", "v")); () }

    def updateOp(): Unit = {
      val m = 3 + rnd.nextInt(5); val r = rnd.nextInt(m)
      t.updatePositions(Map("v" -> (col("v") * 2)),
        Some(col("id") % m === r))
      model = model.map { case (id, (o, v, w, f)) =>
        id -> (o, if (id % m == r) v * 2 else v, w, f) }
    }
    def branchOp(check: String => Unit): Unit = {
      // one full write-audit-publish cycle as a composite op: stage 1-2
      // merges on a branch, assert main is UNTOUCHED mid-stage (the
      // audit invariant), then fastForward and fold the staged batches
      // into the model in commit order
      val bn = s"b$ord"
      t.createBranch(bn)
      val b = t.branch(bn)
      val staged = (1 to (1 + rnd.nextInt(2))).map { _ =>
        val ids = rnd.shuffle((0L until 200L).toList)
          .take(5 + rnd.nextInt(10))
        val rows = ids.map { id =>
          ord += 1; (id, ord, rnd.nextInt(100000).toLong) }
        b.merge(withW(rows.toDF("id", "ord", "v")
          .withColumn("g", pmod(col("id"), lit(5L)))), keys = Seq("id"),
          dedupKey = Seq("id"), orderCol = "ord",
          mode = if (rnd.nextBoolean()) "cow" else "mor")
        rows
      }
      check("branch staged (main must be untouched)")
      t.fastForward(bn)
      staged.foreach(_.foreach { case (id, o, v) =>
        model += id -> (o, v, if (evolved) Some(o % 7) else None,
          fOf(o)) })
    }

    def check(op: String): Unit = {
      // sorted Seq, not Set: a bug that double-applies a file yields
      // duplicate identical rows, which a set compare cannot see
      if (!evolved) {
        val got = t.read().select("id", "ord", "v")
          .as[(Long, Long, Long)].collect().toSeq.sorted
        val want = model.map { case (id, (o, v, _, _)) => (id, o, v) }
          .toSeq.sorted
        assert(got === want, s"divergence after $op")
      } else {
        // post-evolve: w compares too — pre-evolve rows must read null
        // through every path (plain read, MOR merge view, rewrites)
        val got = t.read().select("id", "ord", "v", "w")
          .as[(Long, Long, Long, Option[Long])].collect().toSeq.sorted
        val want = model.map { case (id, (o, v, w, _)) => (id, o, v, w) }
          .toSeq.sorted
        assert(got === want, s"divergence after $op")
      }
      // f: exact through both eras (float pre-widen, double post —
      // cast(float as double) is exact, so one compare covers both);
      // also pins the widened column's PRUNING path: the scan below
      // filters on f, so a mis-rendered float-era bound would lose rows
      assert(t.schema("f").dataType ===
        (if (widened) org.apache.spark.sql.types.DoubleType
         else org.apache.spark.sql.types.FloatType))
      val gotF = t.read().select(col("id"), col("f").cast("double"))
        .as[(Long, Double)].collect().toSeq.sorted
      val wantF = model.map { case (id, (_, _, _, f)) =>
        (id, f.toDouble) }.toSeq.sorted
      assert(gotF === wantF, s"f divergence after $op")
    }

    // seed via append (merge needs an existing table): unique ids
    val seedRows = rnd.shuffle((0L until 200L).toList).take(40)
      .map { id => ord += 1; (id, ord, rnd.nextInt(100000).toLong) }
    t.append(withW(seedRows.toDF("id", "ord", "v")
      .withColumn("g", pmod(col("id"), lit(5L)))))
    seedRows.foreach { case (id, o, v) =>
      model += id -> (o, v, None, fOf(o)) }
    check("seed")

    // incremental-rollup cross-check: maintain a full-featured aggregate
    // (sum/sumsq/min/max/KMV distinct, k small enough to exercise the
    // estimator and the retraction re-agg on every update/delete) and
    // compare against a one-shot recompute of the CURRENT table state
    val roll = GraftTable(spark, tmpDir(s"fuzz-roll-$seed") + "/t")
    def rollCheck(op: String): Unit = {
      import graft.functions.AggExpressions.kmv_sketch
      import graft.functions.HashExpressions.md5_hash64
      graft.pipeline.IncrementalRollup.maintain(t, roll, Seq("g"),
        Seq("v"), "fuzz", minCols = Seq("v"), maxCols = Seq("v"),
        sumSqCols = Seq("v"), distinctCols = Seq("v"), distinctK = 4)
      val want = t.read().groupBy("g")
        .agg(sum(col("v")).as("v_sum"),
          sum(col("v") * col("v")).as("v_sumsq"),
          min(col("v")).as("v_min"), max(col("v")).as("v_max"),
          kmv_sketch(md5_hash64(col("v").cast("string")), 4).as("sk"),
          count(lit(1)).as("n"))
        .orderBy("g")
        .as[(Long, Long, Long, Long, Long, Seq[Long], Long)]
        .collect().toSeq
      val got = roll.read()
        .select(col("g"), col("v_sum"), col("v_sumsq"), col("v_min"),
          col("v_max"), col("v_distinct_sk"), col("n"))
        .orderBy("g")
        .as[(Long, Long, Long, Long, Long, Seq[Long], Long)]
        .collect().toSeq
      assert(got === want, s"rollup maintenance diverged after $op")
    }
    rollCheck("seed")

    // the second rollup spans the evolve boundary: created AFTER the
    // evolve with sumCols (v, w), its first maintenance round reads a
    // mixed-schema changelog range — pre-evolve inserts must null-fill
    // w and zero-contribute to w_sum while still counting in n
    val roll2 = GraftTable(spark, tmpDir(s"fuzz-roll2-$seed") + "/t")
    def rollCheck2(op: String): Unit = if (evolved) {
      graft.pipeline.IncrementalRollup.maintain(t, roll2, Seq("g"),
        Seq("v", "w"), "fuzz2")
      val want = t.read().groupBy("g")
        .agg(sum(col("v")).as("v_sum"), sum(col("w")).as("w_sum"),
          count(lit(1)).as("n"))
        .orderBy("g")
        .as[(Long, Long, Option[Long], Long)].collect().toSeq
      val got = roll2.read().select(col("g"), col("v_sum"), col("w_sum"),
          col("n")).orderBy("g")
        .as[(Long, Long, Option[Long], Long)].collect().toSeq
      assert(got === want,
        s"cross-evolve rollup maintenance diverged after $op")
    }

    (1 to 23).foreach { i =>
      // mid-fuzz schema evolve (deterministic op 10): every later merge
      // carries w; every earlier row must null-fill it forever after
      if (i == 10) {
        t.addColumns(Seq(org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.LongType, nullable = true)))
        evolved = true
        check("op 10: evolve (metadata-only, no data change)")
      }
      if (i == 14) {
        t.widenColumn("f", org.apache.spark.sql.types.DoubleType)
        widened = true
        check("op 14: widen f float->double (metadata-only)")
      }
      val op = rnd.nextInt(10) match {
        case 6 => branchOp(s => check(s"op $i: $s")); "branchWap"
        case 0 => mergeOp("cow"); "mergeCow"
        case 1 => mergeOp("mor"); "mergeMor"
        case 2 => if (model.nonEmpty) { deleteOp(false); "delete" }
          else { mergeOp("cow"); "mergeCow" }
        case 3 => if (model.nonEmpty) { deleteOp(true); "deletePositions" }
          else { mergeOp("mor"); "mergeMor" }
        case 4 => if (model.nonEmpty) { updateOp(); "updatePositions" }
          else { mergeOp("cow"); "mergeCow" }
        case 5 => t.compact(filesPerPartition = 1 + rnd.nextInt(3))
          "compact"
        case 7 => partialMergeOp(if (rnd.nextBoolean()) "cow" else "mor")
          "partialMerge"
        case 8 => binpackOp(); "binpack"
        case 9 => zorderOp(); "zorder"
      }
      check(s"op $i: $op")
      if (i % 5 == 0) { rollCheck(s"op $i: $op"); rollCheck2(s"op $i: $op") }
    }
    rollCheck("final"); rollCheck2("final")

    // full-history changelog replay: per commit apply deletes then
    // inserts; the replayed multiset must equal the final read
    val tip = t.latestSnapshotId.get
    val ch = t.changes(-1L, tip)
      .select(col("_commit_snapshot_id"), col("_change_type"),
        col("id"), col("ord"), col("v"))
      .as[(Long, String, Long, Long, Long)].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
    val replayed = scala.collection.mutable.Map.empty[(Long, Long, Long), Int]
    ch.foreach { case (_, rows) =>
      rows.filter(_._2 == "delete").foreach { r =>
        val k = (r._3, r._4, r._5)
        replayed(k) = replayed.getOrElse(k, 0) - 1
        if (replayed(k) == 0) replayed.remove(k)
      }
      rows.filter(_._2 == "insert").foreach { r =>
        val k = (r._3, r._4, r._5)
        replayed(k) = replayed.getOrElse(k, 0) + 1
      }
    }
    assert(replayed.values.forall(_ == 1),
      s"changelog replay produced duplicates/negatives: " +
        replayed.filter(_._2 != 1).take(5))
    assert(replayed.keySet ===
      model.map { case (id, (o, v, _, _)) => (id, o, v) }.toSet)
  }
}

package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.table.GraftTable

/** Incrementally-maintained aggregate tables (materialized-view
  * maintenance): keep `dst` equal to
  *
  *   SELECT keys, SUM(c) AS c_sum ... , COUNT(*) AS n FROM src GROUP BY keys
  *
  * by applying the source CHANGELOG's net deltas instead of
  * re-aggregating the source. At 100 TB this is the only viable shape
  * for derived tables: a day's maintenance costs O(changed rows) +
  * a rewrite bounded by the affected keys' files, where the recompute
  * costs a full source scan. SUM/COUNT are retraction-safe (deletes
  * subtract); AVG derives downstream as c_sum / n. MIN/MAX are NOT
  * offered — a retracted extremum is unrecoverable without re-scanning
  * its group, which is exactly the cost this operator exists to avoid.
  *
  * Exactly-once with NO external checkpoint: each maintenance merge is
  * stamped with the idempotent-writer txn `(appId, srcTipSnapshot)`, so
  * the destination table itself records the high-water mark
  * (`dst.lastTxnBatch(appId)`), the stamp commits atomically WITH the
  * delta, and a crash-replay of the same range is a no-op. There is no
  * window in which a crash loses or double-applies a range.
  *
  * The source range is read via `changes(from, tip]` — every commit
  * type (append, COW/MOR merge, delete, update) contributes its exact
  * net row changes; rewrites (compact/fold) are data-equivalent and
  * contribute nothing. Source history must be retained at least as long
  * as the maintenance interval (expire keeps `from` reachable).
  */
object IncrementalRollup {

  /** One maintenance round. Creates `dst` (unpartitioned, schema =
    * keys ++ sums ++ n) on first use. Returns the applied source range
    * `(fromExclusive, tipInclusive)`, or None when up to date. */
  def maintain(src: GraftTable, dst: GraftTable, keys: Seq[String],
      sumCols: Seq[String], appId: String,
      mode: String = "cow"): Option[(Long, Long)] = {
    require(keys.nonEmpty, "at least one group key")
    val tip = src.latestSnapshotId.getOrElse(return None)
    val from = if (dst.exists) dst.lastTxnBatch(appId).getOrElse(-1L)
      else -1L
    if (tip <= from) return None

    val srcSchema = src.schema
    sumCols.foreach(c => require(srcSchema.fieldNames.contains(c),
      s"sum column $c not in source schema"))
    val ch = src.changes(from, tip)
    // net per-key delta: inserts add, deletes subtract (an update is a
    // delete+insert pair in the changelog, so it contributes the net)
    val sgn = when(col("_change_type") === "delete", lit(-1L))
      .otherwise(lit(1L))
    val delta = ch.groupBy(keys.map(col): _*)
      .agg(sum(sgn).as("__delta_n"),
        sumCols.map(c =>
          sum(col(c) * sgn).as(s"__delta_${c}_sum")): _*)

    if (!dst.exists) {
      val aggFields = keys.map(k => srcSchema(k)) ++
        sumCols.map(c => StructField(s"${c}_sum",
          delta.schema(s"__delta_${c}_sum").dataType)) :+
        StructField("n", LongType)
      dst.create(StructType(aggFields.toArray))
    }

    // current values for AFFECTED keys only: the semi-join probe prunes
    // dst's files by key stats, so the read is O(affected keys' files)
    val cur = dst.read()
      .join(delta.select(keys.map(col): _*), keys, "left_semi")
    val combined = cur.join(delta, keys, "full_outer")
      .select(keys.map(col) ++
        sumCols.map(c =>
          (coalesce(col(s"${c}_sum"), lit(0)) +
            coalesce(col(s"__delta_${c}_sum"), lit(0))).as(s"${c}_sum")) :+
        (coalesce(col("n"), lit(0L)) +
          coalesce(col("__delta_n"), lit(0L))).as("n"): _*)
      // a group whose count reaches zero LEFT the aggregate — a CDC
      // delete through the merge, not a zero-count row
      .withColumn("__op", when(col("n") === 0L, lit("D")))

    dst.merge(combined, keys = keys, dedupKey = keys,
      orderCol = keys.head, opCol = Some("__op"), mode = mode,
      txn = Some((appId, tip)))
    Some((from, tip))
  }
}

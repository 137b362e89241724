package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GPT-style sequence packing: lay documents into a contiguous token
  * stream and cut it into fixed-budget packs (training sequences). A
  * document starting inside pack k belongs to pack k even if its tokens
  * straddle the cut — exactly how concatenate-and-chunk pretraining
  * pipelines pack, so pack boundaries are a pure function of the
  * (deterministic) document order and token counts, never of
  * parallelism.
  *
  * Scale shape: one deterministic hash SHARD per document bounds every
  * window to a shard (shards pack independently and in parallel — no
  * global sort, no single-partition window); within a shard the
  * exclusive cumulative token offset is one windowed sum ordered by the
  * id. Shard count is the parallelism knob: each training shard is
  * packed by one task, the standard layout for writing N tokenized
  * training files. */
object Packing {

  /** Per-document pack assignment: adds `shard`, `offset` (exclusive
    * cumulative tokens within the shard) and `pack` (offset / budget).
    * `idCol` MUST be unique — it is both the shard hash input and the
    * within-shard order, so duplicate ids would make offsets
    * order-dependent. The frame is pinned to ROWS (the default RANGE
    * frame sums all ORDER BY peers at once) and pack uses exact integer
    * division (a long/long `/` goes through double, which rounds past
    * 2^53 cumulative tokens). */
  def packAssignments(df: DataFrame, idCol: String, tokensCol: String,
      tokenBudget: Long, shards: Int): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    require(shards > 0, "shards must be positive")
    val shard: Column = Sampling.hashBucket(col(idCol)) % shards
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shard)
      .withColumn("offset",
        sum(col(tokensCol)).over(w) - col(tokensCol))
      .withColumn("pack", expr(s"offset div $tokenBudget"))
  }
}

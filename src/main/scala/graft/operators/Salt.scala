package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations — the manual complement to
  * AQE's runtime skew-join splitting, for when skew is known up front
  * (hot keys in a 100 TB fact table).
  *
  * Salted join: the skewed (large) side gets a random salt in [0, n);
  * the small side is exploded n× with every salt value; the join key
  * becomes (key, salt), splitting each hot key's rows across n tasks.
  * Exactly the standard pattern — results are identical to the unsalted
  * join, shuffle skew is bounded by 1/n.
  */
object Salt {

  /** Inner-join `big` with `small` on `keys`, salting `big` n ways.
    * `small` is replicated n× (choose n ≪ small's acceptable blow-up). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      n: Int): DataFrame = {
    require(n > 0, "salt factor must be positive")
    val salted = big.withColumn("__salt",
      (rand(seed = 42) * n).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase skew-safe aggregation: count-style aggregates per
    * (key, salt) first (map-side bounded groups), then re-aggregate per
    * key. `aggs` maps output column name -> (phase1 agg of a column,
    * phase2 re-agg of the phase-1 result). */
  def saltedCountSum(df: DataFrame, keys: Seq[String], n: Int,
      countCol: String = "n", sumCols: Map[String, Column] = Map.empty)
      : DataFrame = {
    val salted = df.withColumn("__salt", (rand(seed = 42) * n).cast("int"))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as(countCol),
        sumCols.map { case (name, c) => sum(c).as(name) }.toSeq: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(sum(col(countCol)).as(countCol),
        sumCols.keys.map(name => sum(col(name)).as(name)).toSeq: _*)
  }
}

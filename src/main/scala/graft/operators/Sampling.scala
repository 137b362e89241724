package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * A row's split must be a pure function of its IDENTITY — not of
  * partitioning, sampling seeds, or corpus size — so that (a) the same
  * document lands in the same split on every run and every engine, (b)
  * growing the corpus never moves existing rows between splits (no
  * train/test contamination across dataset versions), and (c) the
  * assignment is auditable in SQL. `randomSplit` satisfies none of these.
  *
  * Bucket = first 8 hex digits of MD5(id) mod 10_000 — MD5 for the same
  * engine-portability reason as SimHash64's token hash: any engine
  * reproduces the exact assignment, so the split is oracle-checkable.
  */
object Sampling {

  val Buckets = 10000

  /** The [0, 10000) hash bucket for an id column. */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % Buckets

  /** Add a `split` column assigning each row to a named split by
    * cumulative fraction of its hash bucket, e.g.
    * `hashSplit(df, "doc_id", Seq("train" -> 0.9, "val" -> 0.05,
    * "test" -> 0.05))`. Fractions must sum to 1. */
  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splits must be non-empty with positive fractions")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val bounds = cum.map(c => math.round(c * Buckets))
    val b = hashBucket(col(idCol))
    val expr = splits.zip(bounds).dropRight(1)
      .foldRight(lit(splits.last._1): Column) {
        case (((name, _), bound), rest) => when(b < bound, name).otherwise(rest)
      }
    df.withColumn("split", expr)
  }

  /** Weighted source mixing: down-sample each source so the kept corpus
    * approaches the target weight ratios, scaled to the most constrained
    * source (no repetition — a row is kept at most once). Given integer
    * weights w_s, capacity C = min_s ⌊n_s·Buckets/w_s⌋ (the largest
    * common scale at which every source can fill its quota), and source s
    * keeps rows with hashBucket(id) < ⌊w_s·C/n_s⌋ — all integer
    * arithmetic, so the exact membership is reproducible in any engine.
    * Sources without a weight are dropped. Like [[hashSplit]], membership
    * is a pure function of row identity given the per-source totals.
    *
    * The only non-row-local input is one count per source (a bounded
    * aggregate pull); the filter itself is map-only — the shape that
    * rebalances a 100 TB corpus in a single pass. */
  def mixSources(df: DataFrame, idCol: String, sourceCol: String,
      weights: Seq[(String, Long)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be non-empty and positive")
    val names = weights.map(_._1)
    require(names.distinct.size == names.size, "duplicate source in weights")
    val counts = df.filter(col(sourceCol).isin(names: _*))
      .groupBy(sourceCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = names.filterNot(counts.contains)
    require(missing.isEmpty, s"weighted sources absent from data: $missing")
    val cap = weights.map { case (s, wt) => counts(s) * Buckets / wt }.min
    val bound = weights.foldRight(lit(0L): Column) {
      case ((s, wt), rest) =>
        when(col(sourceCol) === s, lit(wt * cap / counts(s))).otherwise(rest)
    }
    df.filter(hashBucket(col(idCol)) < bound)
  }

  /** Stratified deterministic sampling: keep a per-stratum fraction of
    * rows (the training-mix rebalancing step — e.g. language quotas).
    * A row survives iff `hashBucket(id) < round(fraction(stratum) *
    * Buckets)`, so selection is a pure function of row identity like
    * [[hashSplit]]: re-sampling a grown corpus keeps every previously
    * selected row (monotone dataset versioning — raising a fraction
    * only ADDS rows), and any engine reproduces the exact membership.
    * Strata not in `fractions` fall back to `defaultFraction`. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    require((fractions.values.toSeq :+ defaultFraction)
      .forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be within [0, 1]")
    val b = hashBucket(col(idCol))
    val bound = fractions.toSeq.sortBy(_._1)
      .foldRight(lit(math.round(defaultFraction * Buckets)): Column) {
        case ((g, f), rest) =>
          when(col(stratumCol) === g, lit(math.round(f * Buckets)))
            .otherwise(rest)
      }
    df.filter(b < bound)
  }
}

package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** KMV (bottom-k) distinct sketch: exact below capacity, mergeable and
  * partitioning-invariant at capacity, estimate within the theoretical
  * error band, deterministic across runs. */
class KmvDistinctSpec extends SparkSpec {
  import spark.implicits._
  import AggExpressions.kmv_distinct
  import HashExpressions.md5_hash64

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.agg(kmv_distinct(md5_hash64($"v"), k).as("sk"))
      .select($"sk.est", $"sk.n_tracked")
      .as[(Double, Long)].head()

  test("below capacity the sketch is EXACT (it saw every distinct hash)") {
    val df = (1 to 1000).map(i => s"val-${i % 100}").toDF("v")
    val (est, tracked) = sketch(df, k = 256)
    assert(tracked === 100L)
    assert(est === 100.0)
  }

  test("at capacity the estimate lands within the KMV error band and " +
      "is partitioning-invariant (merge correctness)") {
    val df = (1 to 20000).map(i => s"item-$i").toDF("v")
    val (est1, t1) = sketch(df.repartition(1), k = 256)
    val (est16, t16) = sketch(df.repartition(16), k = 256)
    assert(t1 === 256L && t16 === 256L)
    // merge must be exact: same sketch whatever the partitioning
    assert(est1 === est16)
    // stderr ~ 1/sqrt(k-2) ≈ 6.3%; 4σ band
    assert(math.abs(est1 - 20000.0) / 20000.0 < 0.25,
      s"estimate $est1 off by more than 25% from 20000")
  }

  test("duplicates never inflate the sketch; nulls are ignored") {
    val df = ((1 to 50).map(i => s"x-$i") ++ (1 to 50).map(i => s"x-$i"))
      .toDF("v")
      .unionByName(Seq.empty[String].toDF("v"))
      .unionByName(spark.sql("SELECT CAST(NULL AS STRING) AS v"))
    val (est, tracked) = sketch(df, k = 64)
    assert((est, tracked) === ((50.0, 50L)))
  }
}

package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.SparkSpec

/** Misra-Gries heavy hitters: retention + count-error GUARANTEES hold
  * under any partitioning (counts themselves may vary with merge order —
  * that is the documented contract, so no SQL oracle). */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // 1000 tokens: "hot" 400, "warm" 200, 400 cold singletons-ish
  private def skewed = (
    Seq.fill(400)("hot") ++ Seq.fill(200)("warm") ++
      (0 until 400).map(i => s"cold${i % 80}")
  ).toDF("tok")

  private def summary(df: org.apache.spark.sql.DataFrame, k: Int)
      : Map[String, Long] =
    df.agg(AggExpressions.heavy_hitters(col("tok"), k).as("hh"))
      .head().getSeq[Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("guarantees hold under any partitioning") {
    val n = 1000L
    val k = 10
    for (parts <- Seq(1, 7, 32)) {
      val s = summary(skewed.repartition(parts), k)
      assert(s.size <= k)
      // retention: freq > n/(k+1) = 90.9 -> hot(400) and warm(200) present
      assert(s.contains("hot") && s.contains("warm"), s"parts=$parts: $s")
      // count error: lower bound within n/(k+1) of truth, never above it
      assert(s("hot") <= 400L && s("hot") >= 400L - n / (k + 1))
      assert(s("warm") <= 200L && s("warm") >= 200L - n / (k + 1))
    }
  }

  test("exact counts when distinct items fit in k counters") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .toDF("tok")
    for (parts <- Seq(1, 4)) {
      val s = summary(df.repartition(parts), 16)
      assert(s === Map("a" -> 5L, "b" -> 3L, "c" -> 2L))
    }
  }

  test("per-group summaries via groupBy") {
    val df = (Seq.fill(50)(("g1", "x")) ++ Seq.fill(10)(("g1", "y")) ++
      Seq.fill(30)(("g2", "z"))).toDF("g", "tok")
    val byGroup = df.groupBy("g")
      .agg(AggExpressions.heavy_hitters(col("tok"), 4).as("hh"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Row](1).map(x => x.getString(0)).toSeq).toMap
    assert(byGroup("g1").head === "x") // sorted count-desc
    assert(byGroup("g2") === Seq("z"))
  }

  test("rejects non-string input at analysis time") {
    val e = intercept[Exception] {
      Seq(1L, 2L).toDF("tok")
        .agg(AggExpressions.heavy_hitters(col("tok"), 4)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}

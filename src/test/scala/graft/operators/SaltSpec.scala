package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SaltSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on skewed data") {
    // hot key 1 dominates
    val big = ((1 to 5000).map(_ => (1L, "hot")) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, "cold"))).toDF("k", "tag")
    val small = Seq((1L, "dim1"), (2L, "dim2"), (3L, "dim3")).toDF("k", "dim")
    val plain = big.join(small, Seq("k"))
      .groupBy("k", "dim").count().orderBy("k").collect().toSeq
    val salted = Salt.saltedJoin(big, small, Seq("k"), n = 8)
      .groupBy("k", "dim").count().orderBy("k").collect().toSeq
    assert(salted === plain)
  }

  test("salted aggregation equals the plain aggregation") {
    val df = ((1 to 3000).map(_ => (1L, 2.0)) ++
      (1 to 50).map(i => (i.toLong % 5 + 2, 1.0))).toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
      .orderBy("k").collect().toSeq
    val salted = Salt.saltedCountSum(df, Seq("k"), n = 8,
      sumCols = Map("sv" -> $"v")).orderBy("k").collect().toSeq
    assert(salted === plain)
  }
}

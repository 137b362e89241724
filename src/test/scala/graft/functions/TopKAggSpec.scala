package graft.functions

import org.apache.spark.sql.{AnalysisException, Row}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** topk_by input typing: integral and string ids work end to end
  * (including the partial-aggregation serialize/merge path), unsupported
  * id types fail at ANALYSIS time — never a runtime ClassCastException. */
class TopKAggSpec extends SparkSpec {

  private def ids(row: Row): Seq[Any] =
    row.getAs[scala.collection.Seq[Row]](0).map(_.get(0)).toSeq

  test("topk_by over long, int and string id columns") {
    import spark.implicits._
    val df = Seq(
      (1L, 1, "a", 0.9), (2L, 2, "b", 0.5),
      (3L, 3, "c", 0.7), (4L, 4, "d", 0.1))
      .toDF("id_l", "id_i", "id_s", "score")
      .repartition(4) // force partial buffers + serialize + merge
    val top2 = ids(df.agg(AggExpressions
      .topk_by(col("id_l"), col("score"), 2)).collect()(0))
    assert(top2 == Seq(1L, 3L))
    val top2i = ids(df.agg(AggExpressions
      .topk_by(col("id_i"), col("score"), 2)).collect()(0))
    assert(top2i == Seq(1, 3))
    val top2s = ids(df.agg(AggExpressions
      .topk_by(col("id_s"), col("score"), 2)).collect()(0))
    assert(top2s == Seq("a", "c"))
  }

  test("integer scores are accepted; ties break by smaller id") {
    import spark.implicits._
    val df = Seq((10L, 5), (7L, 5), (3L, 1)).toDF("id", "s").repartition(2)
    val top = ids(df.agg(AggExpressions
      .topk_by(col("id"), col("s"), 2)).collect()(0))
    assert(top == Seq(7L, 10L)) // equal scores → ascending id
  }

  test("non-integral/string id is rejected at analysis time") {
    import spark.implicits._
    val df = Seq((Array(1.0f), 0.5)).toDF("emb", "s")
    val e = intercept[AnalysisException] {
      df.agg(AggExpressions.topk_by(col("emb"), col("s"), 1)).collect()
    }
    assert(e.getMessage.contains("topk_by"))
  }

  test("non-numeric score is rejected at analysis time") {
    import spark.implicits._
    val df = Seq((1L, "oops")).toDF("id", "s")
    val e = intercept[AnalysisException] {
      df.agg(AggExpressions.topk_by(col("id"), col("s"), 1)).collect()
    }
    assert(e.getMessage.contains("topk_by"))
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  // 3 sources with deliberately unequal sizes
  private lazy val corpus = (
    (0L until 400L).map(i => (i, "web")) ++
    (400L until 600L).map(i => (i, "books")) ++
    (600L until 700L).map(i => (i, "code"))
  ).toDF("doc_id", "source")

  test("mixSources hits the target ratios scaled to the binding source") {
    // weights 1:1:1 over 400/200/100 docs — 'code' binds; every source
    // should keep ~100 docs
    val kept = Sampling.mixSources(corpus, "doc_id", "source",
      Seq("web" -> 1L, "books" -> 1L, "code" -> 1L))
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("code") === 100L) // binding source keeps everything
    assert(math.abs(kept("web") - 100L) <= 15, s"web=${kept("web")}")
    assert(math.abs(kept("books") - 100L) <= 15, s"books=${kept("books")}")
  }

  test("mixSources drops unweighted sources and is deterministic") {
    val a = Sampling.mixSources(corpus, "doc_id", "source",
      Seq("web" -> 2L, "books" -> 1L))
    assert(a.filter(col("source") === "code").count() === 0)
    val ids1 = a.select("doc_id").as[Long].collect().sorted
    val ids2 = Sampling.mixSources(corpus.repartition(13), "doc_id", "source",
      Seq("web" -> 2L, "books" -> 1L))
      .select("doc_id").as[Long].collect().sorted
    assert(ids1 === ids2)
    // kept web ≈ 2× kept books
    val k = a.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(k("web") - 2.0 * k("books")) / k("web") < 0.2,
      s"ratio off: $k")
  }

  test("mixSources refuses weights for absent sources") {
    val e = intercept[IllegalArgumentException] {
      Sampling.mixSources(corpus, "doc_id", "source",
        Seq("web" -> 1L, "wiki" -> 1L))
    }
    assert(e.getMessage.contains("wiki"))
  }

  test("mixSources keeps a subset of identity: growing corpus keeps rows") {
    // same counts passed (same bounds) -> a kept row stays kept when
    // unrelated rows are added, because membership is hash(id) < bound
    val kept = Sampling.mixSources(corpus, "doc_id", "source",
      Seq("web" -> 1L, "books" -> 1L, "code" -> 1L))
      .select("doc_id").as[Long].collect().toSet
    val bigger = corpus.unionByName(
      (700L until 800L).map(i => (i, "code")).toDF("doc_id", "source"))
    val kept2 = Sampling.mixSources(bigger, "doc_id", "source",
      Seq("web" -> 1L, "books" -> 1L, "code" -> 2L))
      .select("doc_id").as[Long].collect().toSet
    // code's bound only ROSE (more rows, more weight) — web/books bounds
    // rose too (capacity driven by code) — so no previously-kept row drops
    assert(kept.subsetOf(kept2))
  }
}

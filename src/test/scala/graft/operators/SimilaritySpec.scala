package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val em = spark.read
    .parquet(s"${sf()}/embeddings.parquet")

  test("brute-force top-k: k rows per query, ranks contiguous, self excluded") {
    val queries = em.filter($"vec_id" < 3)
    val out = SimilaritySearch.bruteForceTopK(em, queries, "vec_id",
      "embedding", k = 5).collect()
    assert(out.length === 15)
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted === (1 to 5).toArray)
      assert(!rows.exists(_.getAs[Long]("neighbor_id") == q))
      // scores non-increasing with rank
      val sorted = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  /** planted clusters: 20 deterministic unit-ish centers × 8 members each
    * with small noise — the structure LSH is built to retrieve. */
  private lazy val planted = {
    val rnd = new scala.util.Random(1234)
    val dim = 32
    val rows = for {
      c <- 0 until 20
      center = Array.fill(dim)(rnd.nextGaussian().toFloat)
      m <- 0 until 8
    } yield ((c * 8 + m).toLong, c,
      center.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    rows.toSeq.toDF("vec_id", "cluster", "embedding")
  }

  test("LSH top-k achieves >= 0.9 recall@5 vs brute force on clustered data") {
    val queries = planted.filter($"vec_id" % 8 === 0) // one per cluster
    val exact = SimilaritySearch.bruteForceTopK(planted, queries, "vec_id",
      "embedding", k = 5).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val approx = SimilaritySearch.lshTopK(planted, queries, "vec_id",
      "embedding", k = 5, nTables = 6, planesPerTable = 12).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@5 = $mean")
  }

  test("IVF top-k achieves >= 0.9 recall@5 vs brute force on clustered data") {
    val queries = planted.filter($"vec_id" % 8 === 0)
    val exact = SimilaritySearch.bruteForceTopK(planted, queries, "vec_id",
      "embedding", k = 5).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val approx = SimilaritySearch.ivfTopK(planted, queries, "vec_id",
      "embedding", k = 5, nLists = 16, nProbe = 4).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"IVF mean recall@5 = $mean")
  }

  test("IVF Hamming-prefiltered assignment keeps recall@5 >= 0.9 on " +
      "clustered data (the sub-k*dim build path)") {
    val queries = planted.filter($"vec_id" % 8 === 0)
    val exact = SimilaritySearch.bruteForceTopK(planted, queries, "vec_id",
      "embedding", k = 5).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val approx = SimilaritySearch.ivfTopK(planted, queries, "vec_id",
      "embedding", k = 5, nLists = 16, nProbe = 4,
      annBits = 32, annProbeDist = 8).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"prefiltered IVF mean recall@5 = $mean")
  }

  test("LSH candidate set is a small fraction of all pairs on clustered data") {
    val queries = planted.filter($"vec_id" % 8 === 0)
    val nPairs = SimilaritySearch.lshCandidates(planted, queries, "vec_id",
      "embedding", nTables = 6, planesPerTable = 12).count()
    val allPairs = planted.count() * queries.count()
    assert(nPairs < allPairs / 2, s"LSH barely pruned: $nPairs of $allPairs")
  }

  test("quantized cosine of identical vectors is 1.0 exactly") {
    val one = em.filter($"vec_id" === 0).select($"embedding")
    import graft.functions.VectorFunctions._
    val cos = one.select(
      cosineQ(quantize($"embedding"), quantize($"embedding")).as("c"))
      .as[Double].collect()(0)
    assert(cos === 1.0)
  }

  test("random projection: deterministic, null-free, J-L separates dups") {
    import graft.functions.VectorFunctions._
    val proj = randomProjectQ(quantize($"embedding"), dOut = 8)
    val a = em.select($"vec_id", proj.as("p")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = em.repartition(5).select($"vec_id", proj.as("p")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a === b, "projection must not depend on partitioning")
    assert(a.values.forall(v => v.length == 8 && v.forall(_ != null)))
    // identical inputs project identically; distinct vectors stay apart
    // (random 64-dim vectors almost never collide in 8 dims)
    assert(a.values.toSeq.distinct.size > a.size / 2)
  }
}

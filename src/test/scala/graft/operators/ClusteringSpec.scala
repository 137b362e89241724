package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** 3 tight planted clusters around orthogonal anchors in 8 dims — any
    * correct k-means separates them in one round. */
  private def planted = {
    val anchors = Seq(
      Array(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f, 0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f))
    // ids interleave across clusters so the k-smallest-id init picks one
    // vector from each planted cluster
    (0L until 30L).map { id =>
      val a = anchors((id % 3).toInt)
      val v = a.zipWithIndex.map { case (x, i) =>
        x + ((id * 7 + i) % 5).toFloat / 100f // small deterministic jitter
      }
      (id, v)
    }.toDF("vec_id", "embedding")
  }

  test("kmeans recovers planted clusters and is deterministic") {
    val a1 = Clustering.kmeans(planted, "vec_id", "embedding", k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = Clustering.kmeans(planted.repartition(7), "vec_id", "embedding",
      k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 === a2, "assignment must not depend on partitioning")
    // every planted cluster maps to exactly one k-means cluster
    (0 until 3).foreach { g =>
      val labels = (0L until 30L).filter(_ % 3 == g).map(a1).distinct
      assert(labels.size === 1, s"planted cluster $g split across $labels")
    }
    assert(a1.values.toSet.size === 3)
  }

  test("identical vectors always land in the same cluster") {
    val doubled = planted.unionByName(
      planted.select((col("vec_id") + 1000L).as("vec_id"), col("embedding")))
    val asg = Clustering.kmeans(doubled, "vec_id", "embedding", k = 3, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0L until 30L).foreach { id =>
      assert(asg(id) === asg(id + 1000L), s"twin of $id drifted")
    }
  }

  test("empty clusters keep their previous centroid") {
    // v3 == v0 exactly: every tie breaks to the LOWEST index, so centroid 3
    // receives no members and must survive rounds via keep-previous
    val vs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(0f, 0f, 1f, 0f)), (3L, Array(1f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val asg = Clustering.kmeans(vs, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(asg(0L) === 0 && asg(3L) === 0)
    assert(asg(1L) === 1 && asg(2L) === 2)
  }

  test("semanticNearDups finds planted duplicates with recall 1") {
    val doubled = planted.unionByName(
      planted.select((col("vec_id") + 1000L).as("vec_id"), col("embedding")))
    val pairs = Clustering.semanticNearDups(doubled, "vec_id", "embedding",
      threshold = 0.999, k = 3, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 30L).foreach { id =>
      assert(pairs.contains((id, id + 1000L)), s"missed planted dup of $id")
    }
  }

  test("centroid kernels fail loudly on ragged vector dims") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import graft.functions.NativeOps
    val qv = ArrayData.toArrayData(Array(1L, 2L, 3L)) // dim 3
    val sums = Array(Array(1L, 2L))                   // centroid dim 2
    val counts = Array(1L)
    val e1 = intercept[IllegalArgumentException] {
      NativeOps.nearestCentroid(qv, sums, counts)
    }
    assert(e1.getMessage.contains("dim"))
    val e2 = intercept[IllegalArgumentException] {
      NativeOps.nearestCentroidAnn(qv, 0L, sums, counts,
        Array(0L), probeDist = 64)
    }
    assert(e2.getMessage.contains("dim"))
  }

  test("headroom guard rejects magnitudes that would overflow int64") {
    val big = (0L until 4L)
      .map(id => (id, Array.fill(64)(3e8f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Clustering.kmeans(big, "vec_id", "embedding", k = 2, iters = 1).collect()
    }
    assert(e.getMessage.contains("headroom"))
  }
}

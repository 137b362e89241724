package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.AggExpressions
import graft.functions.VectorFunctions

/** Deterministic k-means over embedding columns — the clustering stage of
  * semantic dedup (SemDeDup: cluster the corpus, then search for
  * near-duplicates only WITHIN clusters) and of IVF-style index builds.
  *
  * Determinism contract (what makes the result oracle-checkable across
  * engines, and identical across runs/partitionings):
  *   - vectors are quantized to integers (×1000, round) up front;
  *   - a centroid is carried as its EXACT integer member-sum plus count —
  *     never as a floating average, so the aggregation is order-free;
  *   - the point-to-centroid distance ranks by
  *       dist_j = Σ_i (n_j·x_i − s_ji)² / n_j²   (≡ ‖x − s_j/n_j‖²)
  *     whose numerator is exact int64; the single long→double cast and one
  *     IEEE division are identical in any engine;
  *   - argmin ties break to the lowest centroid index;
  *   - initial centroids are the vectors of the k smallest ids.
  *
  * Scale shape: centroids broadcast into the assignment expression (k × dim
  * literals, codegen'd fold per row — no join); the update is ONE groupBy
  * over k groups using the native element-wise [[AggExpressions.VectorSumAgg]]
  * (map-side partial aggregation ⇒ k × dim longs per task cross the wire,
  * not N × dim exploded rows); the per-iteration driver pull is k rows of
  * (sum, count) — bounded metadata, not data. Iterations re-read a
  * localCheckpoint-materialized quantized frame, so the parquet scan and
  * quantization run once regardless of iteration count.
  *
  * Int64 headroom: |n·x_i − s_i| ≤ n·maxq + max|s_i|, so the numerator
  * needs dim·(n·maxq + max|s|)² < 2⁶³ — at dim 64 and unit-normalized
  * embeddings (maxq ≤ 1000 at scale 1000) that holds to clusters of ~190k
  * members; larger corpora drop `scale` (scale 100 → ~1.9M members) or
  * sub-sample the update set per cluster. The guard below checks the
  * actual magnitudes in BigInt and fails loudly instead of wrapping.
  */
object Clustering {

  /** Integer centroid state: exact member sum per dimension + member count. */
  final case class Centroid(index: Int, sum: Array[Long], n: Long)

  /** 0-based nearest-centroid index (ties → lowest index), ranking by
    * dist_j = Σ_i (n_j·x_i − s_ji)² / n_j² (double, engine-exact). The
    * native expression evaluates all k distances in one tight O(k·dim)
    * primitive loop per row — the compositional form (k interpreted
    * aggregate∘zip_with columns + array_position(array_min)) spends its
    * time in lambda dispatch once k scales with the corpus
    * ([[graft.functions.VectorExpressions.NearestCentroidExpr]];
    * semantics pinned bit-identical by ClusteringSpec and the
    * q_kmeans/q_semdedup oracles). */
  def assignment(qv: Column, centroids: Seq[Centroid]): Column =
    graft.functions.VectorExpressions.nearest_centroid(qv,
      centroids.map(_.sum.toIndexedSeq).toIndexedSeq,
      centroids.map(_.n).toIndexedSeq)

  /** Driver-side Rademacher signature of a centroid's integer sum — the
    * centroid direction is sum/n, and sign(dot(sum/n, r)) = sign(dot(sum,
    * r)) for n > 0, so the signature computes on the exact sum with no
    * division. Same md5-parity signs as the row-side expression. */
  private def sigOfSum(sum: Array[Long], nBits: Int, seed: Int): Long = {
    var out = 0L
    var j = 0
    while (j < nBits) {
      val row = VectorFunctions.RandomProjection.signs(j, seed)
      var acc = 0L
      var i = 0
      while (i < sum.length) { acc += sum(i) * row(i); i += 1 }
      if (acc >= 0L) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Lloyd's k-means: `iters` assignment+update rounds from the k-smallest-id
    * init, then a final assignment pass against the updated centroids.
    * Returns (id, cluster) — id keeps `idCol`'s values, cluster ∈ [0, k).
    * Clusters that lose every member keep their previous centroid.
    *
    * `annPlanes > 0` switches the assignment pass to ANN-assisted: rows and
    * centroids carry an `annPlanes`-bit integer-exact Rademacher signature,
    * and exact distances are evaluated only against centroids within
    * `annProbe` Hamming bits (no candidate → full exact fallback, so every
    * row is still assigned deterministically). At corpus-scaled k (SemDeDup
    * uses k ≈ n/250) this drops the assignment pass from k·dim multiplies
    * per row to k popcounts + a few candidate distances — the documented
    * 100 TB remedy for the n·k exact pass. The algorithm stays
    * deterministic end-to-end, so the q_kmeans_ann oracle mirrors it in
    * SQL exactly (signature, prefilter, fallback and all). */
  def kmeans(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, scale: Int = 1000, annPlanes: Int = 0, annProbe: Int = 2,
      annSeed: Int = 11): DataFrame = {
    require(k > 0 && iters >= 0, "k must be positive, iters non-negative")
    val useAnn = annPlanes > 0
    val base = vecs.select(col(idCol).as("id"),
      VectorFunctions.quantize(col(vecCol), scale).as("qv"))
    // the signature rides inside the one materialized frame — computed
    // once, reused by every assignment pass
    val q = (if (useAnn) base.withColumn("sig",
        graft.functions.VectorExpressions.rademacher_sig(
          col("qv"), annPlanes, annSeed))
      else base).localCheckpoint(false)

    def assign(cs: Seq[Centroid]): Column =
      if (useAnn)
        graft.functions.VectorExpressions.nearest_centroid_ann(
          col("qv"), col("sig"),
          cs.map(_.sum.toIndexedSeq).toIndexedSeq,
          cs.map(_.n).toIndexedSeq,
          cs.map(c => sigOfSum(c.sum, annPlanes, annSeed)).toIndexedSeq,
          annProbe)
      else assignment(col("qv"), cs)

    val init = q.orderBy("id").limit(k).collect()
    require(init.length == k, s"need at least $k vectors, got ${init.length}")
    var centroids: Seq[Centroid] = init.zipWithIndex.map { case (row, j) =>
      Centroid(j, row.getSeq[Long](1).toArray, 1L)
    }.toSeq
    val dim = centroids.head.sum.length
    // one cheap pass for the true max |quantized coordinate| — feeds the
    // int64-headroom guard for every subsequent distance expression
    val maxQ = q.agg(max(array_max(transform(col("qv"), x => abs(x)))))
      .head().getLong(0)

    def guard(cs: Iterable[Centroid]): Unit = cs.foreach { c =>
      val b = BigInt(c.n) * maxQ + c.sum.iterator.map(math.abs).max
      require(BigInt(dim) * b * b < BigInt(Long.MaxValue),
        s"cluster ${c.index} (n=${c.n}) exceeds exact-int64 distance " +
          "headroom — lower `scale` or sub-sample the centroid update")
    }
    guard(centroids)

    for (_ <- 0 until iters) {
      val assigned = q.withColumn("cluster", assign(centroids))
      // k rows of (cluster, sum-vector, count) — a bounded metadata pull
      val updated = assigned.groupBy("cluster")
        .agg(AggExpressions.vector_sum(col("qv"), dim).as("s"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => r.getInt(0) ->
          Centroid(r.getInt(0), r.getSeq[Long](1).toArray, r.getLong(2)))
        .toMap
      guard(updated.values)
      centroids = centroids.map(c => updated.getOrElse(c.index, c))
    }

    q.select(col("id"), assign(centroids).as("cluster"))
  }

  /** SemDeDup: k-means-cluster the corpus, then exact quantized-cosine
    * near-dup pairs WITHIN clusters only — the all-pairs product shrinks to
    * Σ|cluster|² without an LSH family, and the cluster granularity is
    * tunable to executor memory. Returns (id_a, id_b, cos). */
  def semanticNearDups(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, k: Int, iters: Int = 1, annPlanes: Int = 0,
      annProbe: Int = 2): DataFrame = {
    val asg = kmeans(vecs, idCol, vecCol, k, iters,
      annPlanes = annPlanes, annProbe = annProbe)
      .withColumnRenamed("id", idCol)
    val clustered = vecs.join(asg, idCol)
    Dedup.embeddingNearDups(clustered, idCol, vecCol, threshold,
      bucket = Some(col("cluster")))
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Java-callable entry points for the native expressions' codegen.
  *
  * Generated Java (Janino) can only resolve STATIC methods, and only
  * top-level Scala objects get static forwarders in their mirror class —
  * a nested `object RollingHash64` inside `HashExpressions` compiles to
  * `HashExpressions$RollingHash64$` with instance methods only, so codegen
  * strings referencing it fail to compile and Spark silently falls back to
  * interpreted execution for the whole stage (caught empirically: javac
  * cannot resolve the nested form). Every doGenCode must target THIS
  * object.
  */
object NativeOps {

  def rollingHash64(bytes: Array[Byte]): Long =
    HashExpressions.RollingHash64.hash(bytes)

  def simhash64(tokens: ArrayData): Long =
    HashExpressions.SimHash64.ofTokens(tokens)

  def wordShingles(tokens: ArrayData, k: Int): ArrayData =
    HashExpressions.WordShingles.ofTokens(tokens, k)

  def hyperplaneBucket(v: ArrayData, nPlanes: Int, seed: Int): Long =
    VectorExpressions.HyperplaneBucketExpr.bucket(v, nPlanes, seed)

  /** Nearest-centroid argmin over integer centroid state, semantics
    * bit-identical to the compositional form it replaces
    * (Clustering.distTo + array_position(array_min)): per centroid j,
    * dist_j = (Σ_i (n_j·x_i − s_ji)²).toDouble / (n_j·n_j as double);
    * argmin ties break to the LOWEST index (strict `<` keeps the first
    * minimum, exactly array_position's first-equal-element). One tight
    * primitive loop over k×dim — the compositional form builds k
    * interpreted higher-order aggregates per row, which at k=400
    * dominates the whole SemDeDup assignment pass. */
  def nearestCentroid(qv: ArrayData, sums: Array[Array[Long]],
      counts: Array[Long]): Int = {
    val dim = qv.numElements()
    var best = 0
    var bestDist = Double.MaxValue
    var j = 0
    while (j < sums.length) {
      val s = sums(j)
      val n = counts(j)
      var num = 0L
      var i = 0
      val d = if (dim < s.length) dim else s.length
      while (i < d) {
        val diff = n * qv.getLong(i) - s(i)
        num += diff * diff
        i += 1
      }
      val dist = num.toDouble / (n.toDouble * n.toDouble)
      if (dist < bestDist) { bestDist = dist; best = j }
      j += 1
    }
    best
  }

  /** Morton interleave: result bit (i·n + j) = bit i of element j. Null
    * elements contribute zero bits (nulls cluster together). */
  def interleaveBits(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    var out = 0L
    var outBit = 0
    var i = 0
    while (i < bits && outBit < 63) {
      var j = 0
      while (j < n && outBit < 63) {
        val v = if (arr.isNullAt(j)) 0L else arr.getLong(j)
        out |= ((v >>> i) & 1L) << outBit
        outBit += 1
        j += 1
      }
      i += 1
    }
    out
  }
}

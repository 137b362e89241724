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

  def icebergBucketLong(v: Long, n: Int): Int =
    IcebergBucketHash.bucketLong(v, n)

  def icebergBucketUtf8(s: org.apache.spark.unsafe.types.UTF8String,
      n: Int): Int = IcebergBucketHash.bucketUtf8(s, n)

  def icebergBucketBytes(b: Array[Byte], n: Int): Int =
    IcebergBucketHash.bucketBytes(b, n)

  def icebergBucketDecimal(d: org.apache.spark.sql.types.Decimal,
      n: Int): Int = IcebergBucketHash.bucketDecimal(d, n)

  def md5Hash64(s: org.apache.spark.unsafe.types.UTF8String): Long =
    HashExpressions.SimHash64.tokenHash(s.getBytes)

  def simhash64(tokens: ArrayData): Long =
    HashExpressions.SimHash64.ofTokens(tokens)

  def wordShingles(tokens: ArrayData, k: Int): ArrayData =
    HashExpressions.WordShingles.ofTokens(tokens, k)

  def distinctSpanHashes(tokens: ArrayData, w: Int): ArrayData =
    HashExpressions.DistinctSpanHashes.ofTokens(tokens, w)

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
      // a ragged corpus must fail, not silently truncate the distance
      // loop to the shorter width (matches rademacherSig's contract)
      if (dim != s.length)
        throw new IllegalArgumentException(
          s"nearestCentroid: vector dim $dim != centroid dim ${s.length}")
      var num = 0L
      var i = 0
      while (i < dim) {
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

  /** Integer-exact Rademacher bit signature of a QUANTIZED (long) vector:
    * bit j is set iff Σ_i qv_i · sign_j(i) ≥ 0, with the ±1 signs drawn
    * from the same md5-parity rule as the J-L projection
    * ([[VectorFunctions.RandomProjection.signs]]) — integer accumulation,
    * so any engine reproduces the signature bit-for-bit. Fails loudly on
    * vectors wider than the fixed sign matrix instead of truncating. */
  def rademacherSig(qv: ArrayData, signs: Array[Array[Long]]): Long = {
    val dim = qv.numElements()
    var out = 0L
    var j = 0
    while (j < signs.length) {
      val row = signs(j)
      if (dim > row.length)
        throw new IllegalArgumentException(
          s"rademacherSig: input vector exceeds ${row.length} dims: $dim")
      var acc = 0L
      var i = 0
      while (i < dim) { acc += qv.getLong(i) * row(i); i += 1 }
      if (acc >= 0L) out |= (1L << j)
      j += 1
    }
    out
  }

  /** [[nearestCentroid]] with a Hamming-distance prefilter on Rademacher
    * signatures (ANN-assisted assignment — the 100 TB remedy for the n·k
    * exact pass once k scales with the corpus): only centroids whose
    * signature is within `probeDist` bits of the row's compete on exact
    * distance, dropping the per-row cost from k·dim multiplies to k
    * popcounts + |candidates|·dim multiplies. A row with NO candidate in
    * range falls back to the full exact argmin — deterministic, and never
    * left unassigned. Tie-breaks mirror [[nearestCentroid]] (strict `<`
    * keeps the lowest qualifying index). */
  def nearestCentroidAnn(qv: ArrayData, sig: Long, sums: Array[Array[Long]],
      counts: Array[Long], sigs: Array[Long], probeDist: Int): Int = {
    val dim = qv.numElements()
    var best = -1
    var bestDist = Double.MaxValue
    var j = 0
    while (j < sums.length) {
      if (java.lang.Long.bitCount(sig ^ sigs(j)) <= probeDist) {
        val s = sums(j)
        val n = counts(j)
        // fail loudly on ragged input — a truncated exact distance would
        // also disagree with the full-width rademacherSig signature
        if (dim != s.length)
          throw new IllegalArgumentException(
            s"nearestCentroidAnn: vector dim $dim != centroid dim ${s.length}")
        var num = 0L
        var i = 0
        while (i < dim) {
          val diff = n * qv.getLong(i) - s(i)
          num += diff * diff
          i += 1
        }
        val dist = num.toDouble / (n.toDouble * n.toDouble)
        if (dist < bestDist) { bestDist = dist; best = j }
      }
      j += 1
    }
    if (best < 0) nearestCentroid(qv, sums, counts) else best
  }

  /** Nearest-centroid by QUANTIZED COSINE (argmax, exact [[VectorFunctions
    * .cosineQ]] arithmetic: int64 dot / sqrt·sqrt of int64 norms as
    * doubles) with the same Hamming prefilter as [[nearestCentroidAnn]] —
    * the IVF list-assignment kernel. Centroids are raw quantized vectors
    * (no member counts) with their norm factors precomputed; ties break
    * to the LOWEST index (strict `>`), which the caller arranges to be
    * the lowest centroid id. `probeDist >= nBits` degrades gracefully to
    * a full exact argmax — still one map-side O(k·dim) loop per row with
    * no corpus shuffle, which is the structural win over the
    * crossJoin+max_by plan it replaces. Returns the winning centroid
    * INDEX; a row with no candidate in range falls back to the full
    * exact pass, so every row is assigned deterministically. */
  def nearestCosineCentroid(qv: ArrayData, sig: Long,
      cents: Array[Array[Long]], centNorms: Array[Double],
      sigs: Array[Long], probeDist: Int): Int = {
    val dim = qv.numElements()
    var nq = 0L
    var i = 0
    while (i < dim) { val x = qv.getLong(i); nq += x * x; i += 1 }
    val qNorm = math.sqrt(nq.toDouble)
    def pass(filtered: Boolean): Int = {
      var best = -1
      var bestCos = Double.NegativeInfinity
      var j = 0
      while (j < cents.length) {
        if (!filtered ||
          java.lang.Long.bitCount(sig ^ sigs(j)) <= probeDist) {
          val c = cents(j)
          if (dim != c.length)
            throw new IllegalArgumentException(
              s"nearestCosineCentroid: vector dim $dim != centroid dim ${c.length}")
          var dot = 0L
          var d = 0
          while (d < dim) { dot += qv.getLong(d) * c(d); d += 1 }
          val cos = dot.toDouble / (qNorm * centNorms(j))
          if (cos > bestCos) { bestCos = cos; best = j }
        }
        j += 1
      }
      best
    }
    val hit = pass(filtered = true)
    if (hit >= 0) hit
    else {
      val full = pass(filtered = false)
      // all-NaN cosines (a zero vector) pin to list 0 rather than crash
      if (full < 0) 0 else full
    }
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

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over ArrayType(FloatType) columns.
  *
  * Two numeric paths:
  *   - float/double path (`dot`, `cosine`): plain IEEE arithmetic via
  *     zip_with/aggregate — the fast path for ranking;
  *   - quantized path (`quantize`, `dotQ`): vectors scaled ×1000 and
  *     rounded to longs; dot products become exact integer sums that any
  *     engine reproduces bit-identically (the oracle-checkable path, and at
  *     scale the int8/int16-quantization trick real ANN systems use to cut
  *     memory bandwidth 4-8×).
  *
  * All composed from codegen'd built-ins — no UDF boundary per row.
  */
object VectorFunctions {

  /** round(x*scale) per element, as long — deterministic across engines.
    * The float is cast to double BEFORE the multiply so every engine
    * performs the same correctly-rounded double op (float*int promotion
    * rules differ between engines; double-first sidesteps them). */
  def quantize(v: Column, scale: Int = 1000): Column =
    transform(v, x => round(x.cast("double") * lit(scale.toDouble)).cast("long"))

  /** exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** exact integer squared norm of a quantized vector. */
  def normSqQ(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0L), (acc, x) => acc + x)

  /** cosine over quantized vectors: exact integer dot / sqrt of exact
    * integer norms — every operation IEEE-deterministic cross-engine. */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(normSqQ(a).cast("double")) * sqrt(normSqQ(b).cast("double")))

  /** double-precision dot product (fast path). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def normSq(a: Column): Column =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Sign bits of projections onto `nPlanes` fixed pseudo-random
    * (Rademacher) hyperplanes → an LSH bucket id for cosine similarity.
    * Vectors with high cosine land in the same bucket with high
    * probability; used to bucket ANN candidate search. Native expression —
    * one tight O(planes·dims) loop per row (see VectorExpressions). */
  def hyperplaneBucket(v: Column, nPlanes: Int, seed: Int = 7): Column =
    VectorExpressions.hyperplane_bucket(v, nPlanes, seed)

  /** Johnson-Lindenstrauss random projection of a QUANTIZED (long) vector
    * down to `dOut` dimensions with a fixed Rademacher (±1) matrix —
    * the embedding shrink step before indexing/clustering when the source
    * dimension is wasteful. Entry (i, j) of the matrix derives from
    * md5("<seed>:<i>:<j>") (engine-portable like SimHash's token hash),
    * so any engine reproduces the projection EXACTLY: output stays
    * integer (sums of ±input values, no scaling inside), and distances
    * are preserved in expectation per J-L. Map-only, O(dIn·dOut) per row.
    */
  def randomProjectQ(qv0: Column, dOut: Int, seed: Int = 11): Column = {
    // fail loudly past the fixed matrix width: slice would cap the sign
    // row at MaxDims, zip_with would null-pad the shorter side, and the
    // whole projection would silently come out null
    val qv = when(size(qv0) > lit(RandomProjection.MaxDims),
      raise_error(concat(
        lit(s"randomProjectQ: input vector exceeds " +
          s"${RandomProjection.MaxDims} dims: "),
        size(qv0).cast("string")))).otherwise(qv0)
    val outputs = (0 until dOut).map { j =>
      // slice the fixed sign row to the vector's length — zip_with pads
      // the SHORTER side with nulls, which would null the whole sum
      val signs = slice(typedlit(RandomProjection.signs(j, seed).toSeq),
        lit(1), size(qv))
      aggregate(zip_with(qv, signs, (x, s) => x * s),
        lit(0L), (acc, x) => acc + x)
    }
    array(outputs: _*)
  }

  object RandomProjection {
    val MaxDims = 4096
    private val cache =
      scala.collection.concurrent.TrieMap.empty[(Int, Int), Array[Long]]
    /** ±1 per input dim i for output dim j — first md5 hex char parity. */
    def signs(j: Int, seed: Int): Array[Long] =
      cache.getOrElseUpdate((j, seed), {
        val md = java.security.MessageDigest.getInstance("MD5")
        Array.tabulate(MaxDims) { i =>
          md.reset()
          val d = md.digest(s"$seed:$j:$i".getBytes("UTF-8"))
          if (((d(0) >> 4) & 0x1) == 0) 1L else -1L
        }
      })
  }
}

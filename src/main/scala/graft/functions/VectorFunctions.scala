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
}

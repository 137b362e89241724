package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.GraftSqlGlue
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Native vector expressions for the ANN hot path. */
object VectorExpressions {

  /** Rademacher-hyperplane LSH bucket of a float vector: bit p of the
    * result is the sign of the projection onto pseudo-random hyperplane p,
    * whose weight for dimension d is a fixed hash-derived ±1.
    *
    * Native because the compositional version (nPlanes × zip_with +
    * aggregate) runs interpreted at ~planes×dims lambda invocations per
    * row; this is one tight O(planes·dims) primitive loop, codegen'd —
    * the map-side cost of corpus bucketing at 100 TB. */
  case class HyperplaneBucketExpr(child: Expression, nPlanes: Int, seed: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(nPlanes > 0 && nPlanes <= 64,
      s"nPlanes must be in [1, 64] (bits of one long), got $nPlanes")
    override def dataType: DataType = LongType
    override def inputTypes: Seq[GraftSqlGlue.SqlAbstractDataType] = Seq(ArrayType(FloatType))
    override def prettyName: String = "hyperplane_bucket"

    override def nullSafeEval(input: Any): Any =
      HyperplaneBucketExpr.bucket(input.asInstanceOf[ArrayData], nPlanes, seed)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.NativeOps.hyperplaneBucket($c, $nPlanes, $seed)")

    override protected def withNewChildInternal(c: Expression): HyperplaneBucketExpr =
      copy(child = c)
  }

  object HyperplaneBucketExpr {
    /** splitmix64 — a fixed, engine-independent integer mixer. */
    private def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }

    def bucket(v: ArrayData, nPlanes: Int, seed: Int): Long = {
      val n = v.numElements()
      var out = 0L
      var p = 0
      while (p < nPlanes) {
        var acc = 0.0
        var d = 0
        while (d < n) {
          // (p, d) packed disjointly (p < 64 → high bits), so no two
          // plane/dim pairs share a mixer input
          val w = if ((mix((p.toLong << 40) ^ d.toLong ^
            (seed.toLong * 0x9e3779b97f4a7c15L)) & 1L) == 0L) 1.0 else -1.0
          acc += w * v.getFloat(d)
          d += 1
        }
        if (acc >= 0) out |= (1L << p)
        p += 1
      }
      out
    }
  }

  def hyperplane_bucket(v: Column, nPlanes: Int, seed: Int = 7): Column =
    GraftSqlGlue.column(HyperplaneBucketExpr(GraftSqlGlue.expression(v), nPlanes, seed))

  /** Nearest-centroid argmin over broadcast integer centroid state
    * (exact member sums + counts), for the k-means/SemDeDup assignment
    * pass. Native because the compositional form (k × aggregate∘zip_with
    * distance expressions per row) runs interpreted — at k=400 the
    * lambda dispatch dominates the whole pass; this is one tight
    * O(k·dim) primitive loop per row, codegen'd. Semantics are
    * bit-identical ([[NativeOps.nearestCentroid]]). */
  case class NearestCentroidExpr(child: Expression,
      sums: IndexedSeq[IndexedSeq[Long]], counts: IndexedSeq[Long])
      extends UnaryExpression with ExpectsInputTypes {
    require(sums.nonEmpty && sums.length == counts.length,
      "need one (sum, count) per centroid")
    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override def inputTypes: Seq[GraftSqlGlue.SqlAbstractDataType] =
      Seq(ArrayType(LongType))
    override def prettyName: String = "nearest_centroid"

    @transient private lazy val sumArr: Array[Array[Long]] =
      sums.map(_.toArray).toArray
    @transient private lazy val cntArr: Array[Long] = counts.toArray

    override def nullSafeEval(input: Any): Any =
      NativeOps.nearestCentroid(input.asInstanceOf[ArrayData], sumArr, cntArr)

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val s = ctx.addReferenceObj("centSums", sumArr, "long[][]")
      val n = ctx.addReferenceObj("centCounts", cntArr, "long[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.NativeOps.nearestCentroid($c, $s, $n)")
    }

    override protected def withNewChildInternal(c: Expression): NearestCentroidExpr =
      copy(child = c)
  }

  def nearest_centroid(qv: Column, sums: IndexedSeq[IndexedSeq[Long]],
      counts: IndexedSeq[Long]): Column =
    GraftSqlGlue.column(NearestCentroidExpr(GraftSqlGlue.expression(qv),
      sums, counts))

  /** Integer-exact Rademacher signature of a QUANTIZED vector — bit j =
    * (Σ_i qv_i·sign_j(i) ≥ 0) with the md5-parity signs of the J-L
    * projection, so the signature (unlike the float
    * [[HyperplaneBucketExpr]]) is reproducible bit-for-bit by any engine
    * that can evaluate md5. The Hamming-bucket key of ANN-assisted
    * centroid assignment. */
  case class RademacherSigExpr(child: Expression, nBits: Int, seed: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(nBits > 0 && nBits <= 64,
      s"nBits must be in [1, 64] (bits of one long), got $nBits")
    override def dataType: DataType = LongType
    override def inputTypes: Seq[GraftSqlGlue.SqlAbstractDataType] =
      Seq(ArrayType(LongType))
    override def prettyName: String = "rademacher_sig"

    @transient private lazy val signs: Array[Array[Long]] =
      Array.tabulate(nBits)(j => VectorFunctions.RandomProjection.signs(j, seed))

    override def nullSafeEval(input: Any): Any =
      NativeOps.rademacherSig(input.asInstanceOf[ArrayData], signs)

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val s = ctx.addReferenceObj("radSigns", signs, "long[][]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.NativeOps.rademacherSig($c, $s)")
    }

    override protected def withNewChildInternal(c: Expression): RademacherSigExpr =
      copy(child = c)
  }

  def rademacher_sig(qv: Column, nBits: Int, seed: Int = 11): Column =
    GraftSqlGlue.column(RademacherSigExpr(GraftSqlGlue.expression(qv),
      nBits, seed))

  /** [[NearestCentroidExpr]] with a Hamming prefilter on Rademacher
    * signatures (left = quantized vector, right = its signature): exact
    * distances are evaluated only against centroids within `probeDist`
    * signature bits; a row with no centroid in range falls back to the
    * full exact argmin. Semantics pinned by ClusteringSpec and the
    * q_kmeans_ann oracle. */
  case class NearestCentroidAnnExpr(left: Expression, right: Expression,
      sums: IndexedSeq[IndexedSeq[Long]], counts: IndexedSeq[Long],
      sigs: IndexedSeq[Long], probeDist: Int)
      extends BinaryExpression with ExpectsInputTypes {
    require(sums.nonEmpty && sums.length == counts.length &&
      sums.length == sigs.length,
      "need one (sum, count, sig) per centroid")
    require(probeDist >= 0, s"probeDist must be non-negative, got $probeDist")
    override def dataType: DataType = IntegerType
    override def inputTypes: Seq[GraftSqlGlue.SqlAbstractDataType] =
      Seq(ArrayType(LongType), LongType)
    override def prettyName: String = "nearest_centroid_ann"

    @transient private lazy val sumArr: Array[Array[Long]] =
      sums.map(_.toArray).toArray
    @transient private lazy val cntArr: Array[Long] = counts.toArray
    @transient private lazy val sigArr: Array[Long] = sigs.toArray

    override def nullSafeEval(qv: Any, sig: Any): Any =
      NativeOps.nearestCentroidAnn(qv.asInstanceOf[ArrayData],
        sig.asInstanceOf[Long], sumArr, cntArr, sigArr, probeDist)

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val s = ctx.addReferenceObj("centSums", sumArr, "long[][]")
      val n = ctx.addReferenceObj("centCounts", cntArr, "long[]")
      val g = ctx.addReferenceObj("centSigs", sigArr, "long[]")
      defineCodeGen(ctx, ev, (qv, sig) =>
        s"graft.functions.NativeOps.nearestCentroidAnn($qv, $sig, $s, $n, $g, $probeDist)")
    }

    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): NearestCentroidAnnExpr = copy(left = l, right = r)
  }

  def nearest_centroid_ann(qv: Column, sig: Column,
      sums: IndexedSeq[IndexedSeq[Long]], counts: IndexedSeq[Long],
      sigs: IndexedSeq[Long], probeDist: Int): Column =
    GraftSqlGlue.column(NearestCentroidAnnExpr(GraftSqlGlue.expression(qv),
      GraftSqlGlue.expression(sig), sums, counts, sigs, probeDist))

  /** IVF list assignment: argmax quantized COSINE over broadcast raw
    * centroid vectors with the [[NearestCentroidAnnExpr]] Hamming
    * prefilter (left = quantized vector, right = its Rademacher
    * signature). One codegen'd map-side loop per row — replaces the
    * corpus × nLists crossJoin + max_by aggregate plan, removing the
    * corpus-wide shuffle from the IVF build entirely. Ties break to the
    * lowest centroid index; rows with no signature candidate fall back
    * to the full exact argmax ([[NativeOps.nearestCosineCentroid]]). */
  case class NearestCosineCentroidExpr(left: Expression, right: Expression,
      cents: IndexedSeq[IndexedSeq[Long]], sigs: IndexedSeq[Long],
      probeDist: Int)
      extends BinaryExpression with ExpectsInputTypes {
    require(cents.nonEmpty && cents.length == sigs.length,
      "need one (vector, sig) per centroid")
    require(probeDist >= 0, s"probeDist must be non-negative, got $probeDist")
    override def dataType: DataType = IntegerType
    override def inputTypes: Seq[GraftSqlGlue.SqlAbstractDataType] =
      Seq(ArrayType(LongType), LongType)
    override def prettyName: String = "nearest_cosine_centroid"

    @transient private lazy val centArr: Array[Array[Long]] =
      cents.map(_.toArray).toArray
    @transient private lazy val normArr: Array[Double] =
      centArr.map(c => math.sqrt(c.map(x => x * x).sum.toDouble))
    @transient private lazy val sigArr: Array[Long] = sigs.toArray

    override def nullSafeEval(qv: Any, sig: Any): Any =
      NativeOps.nearestCosineCentroid(qv.asInstanceOf[ArrayData],
        sig.asInstanceOf[Long], centArr, normArr, sigArr, probeDist)

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val c = ctx.addReferenceObj("ivfCents", centArr, "long[][]")
      val n = ctx.addReferenceObj("ivfNorms", normArr, "double[]")
      val g = ctx.addReferenceObj("ivfSigs", sigArr, "long[]")
      defineCodeGen(ctx, ev, (qv, sig) =>
        s"graft.functions.NativeOps.nearestCosineCentroid($qv, $sig, $c, $n, $g, $probeDist)")
    }

    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): NearestCosineCentroidExpr = copy(left = l, right = r)
  }

  def nearest_cosine_centroid(qv: Column, sig: Column,
      cents: IndexedSeq[IndexedSeq[Long]], sigs: IndexedSeq[Long],
      probeDist: Int): Column =
    GraftSqlGlue.column(NearestCosineCentroidExpr(
      GraftSqlGlue.expression(qv), GraftSqlGlue.expression(sig),
      cents, sigs, probeDist))

  /** [[NearestCosineCentroidExpr]] over a TORRENT-BROADCAST centroid set
    * instead of expression-held arrays. Same codegen'd zero-shuffle
    * argmax, different shipping: the expression (and thus every
    * serialized task closure and plan copy) carries only the broadcast
    * HANDLE; the centroid payload moves to each executor once via the
    * torrent protocol and is block-managed (evictable, disk-spillable)
    * rather than living inside task binaries. At a persisted index's
    * scale (nLists ~10⁵ × high-dim quantized arrays ≈ 100 MB) the
    * per-task-serialization form is a real driver/scheduler tax; the
    * handle form is the MLlib-KMeans shipping shape. The generated code
    * resolves `bc.value()` ONCE per task (constructor-initialized state),
    * not per row. */
  case class NearestCosineCentroidBcastExpr(left: Expression,
      right: Expression,
      bc: org.apache.spark.broadcast.Broadcast[CentroidSet],
      probeDist: Int)
      extends BinaryExpression with ExpectsInputTypes {
    require(probeDist >= 0, s"probeDist must be non-negative, got $probeDist")
    override def dataType: DataType = IntegerType
    override def inputTypes: Seq[GraftSqlGlue.SqlAbstractDataType] =
      Seq(ArrayType(LongType), LongType)
    override def prettyName: String = "nearest_cosine_centroid_bcast"

    @transient private lazy val data: CentroidSet = bc.value

    override def nullSafeEval(qv: Any, sig: Any): Any =
      NativeOps.nearestCosineCentroid(qv.asInstanceOf[ArrayData],
        sig.asInstanceOf[Long], data.cents, data.norms, data.sigs,
        probeDist)

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("centBc", bc,
        "org.apache.spark.broadcast.Broadcast")
      val d = ctx.addMutableState("graft.functions.CentroidSet", "centData",
        v => s"$v = (graft.functions.CentroidSet) $bcRef.value();")
      defineCodeGen(ctx, ev, (qv, sig) =>
        s"graft.functions.NativeOps.nearestCosineCentroid($qv, $sig, " +
          s"$d.cents(), $d.norms(), $d.sigs(), $probeDist)")
    }

    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): NearestCosineCentroidBcastExpr =
      copy(left = l, right = r)
  }

  def nearest_cosine_centroid_bcast(qv: Column, sig: Column,
      bc: org.apache.spark.broadcast.Broadcast[CentroidSet],
      probeDist: Int): Column =
    GraftSqlGlue.column(NearestCosineCentroidBcastExpr(
      GraftSqlGlue.expression(qv), GraftSqlGlue.expression(sig),
      bc, probeDist))
}

/** Executor-resident centroid payload for
  * [[VectorExpressions.NearestCosineCentroidBcastExpr]] — one torrent
  * transfer per executor, accessed from generated Java via the Scala
  * accessors. */
case class CentroidSet(cents: Array[Array[Long]], norms: Array[Double],
    sigs: Array[Long]) extends Serializable

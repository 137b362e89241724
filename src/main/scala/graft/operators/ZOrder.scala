package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.GraftSqlGlue
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Z-order (Morton-curve) multi-column clustering for sort-on-write.
  *
  * Single-column `sortBy` clustering makes file min/max stats selective
  * for ONE query dimension; a table queried by several columns (user_id
  * AND date; lat AND lon) needs file ranges that are tight in all of
  * them. Z-ordering interleaves the bits of per-column range buckets so
  * that sorting by the single z-value co-locates rows that are close in
  * EVERY dimension — each file then covers a small hyper-rectangle and
  * the snapshot log's per-column min/max prune on any queried dimension
  * (the Delta OPTIMIZE ZORDER BY / Iceberg sort-order z-order idea).
  *
  * Normalization: each column maps to a 2^bits-bucket rank via
  * `width_bucket` over its [min, max] (one tiny aggregate pass,
  * broadcast as literals); nulls go to bucket 0 so they cluster
  * together. Uniform-width buckets (not quantiles) keep the map pure
  * expression — skewed columns degrade toward single-column behavior,
  * never below it.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of each array element:
    * result bit (i·n + j) = bit i of element j. Native + codegen'd — this
    * runs once per row in the write path. */
  case class InterleaveBits(child: Expression, bits: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = LongType
    override def inputTypes: Seq[GraftSqlGlue.SqlAbstractDataType] =
      Seq(ArrayType(LongType))
    override def prettyName: String = "interleave_bits"

    override def nullSafeEval(input: Any): Any =
      graft.functions.NativeOps.interleaveBits(
        input.asInstanceOf[ArrayData], bits)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.NativeOps.interleaveBits($c, $bits)")

    override protected def withNewChildInternal(c: Expression): InterleaveBits =
      copy(child = c)
  }

  def interleave_bits(arr: Column, bits: Int): Column =
    GraftSqlGlue.column(InterleaveBits(GraftSqlGlue.expression(arr), bits))

  /** The z-value column for `cols` (numeric/date/timestamp), `bits` per
    * column. Runs ONE min/max aggregate over `df` to fix the bucket
    * ranges. n·bits must fit a long's sign-safe 63 bits. */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int): Column = {
    require(cols.nonEmpty, "zorder needs at least one column")
    require(cols.size * bits <= 63,
      s"${cols.size} cols × $bits bits exceeds 63 interleaved bits")
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"mn_$c"),
      max(col(c).cast("double")).as(s"mx_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = (1L << bits).toInt
    val buckets = cols.map { c =>
      val (lo, hi) = (r.getAs[Any](s"mn_$c"), r.getAs[Any](s"mx_$c"))
      (lo, hi) match {
        case (l: java.lang.Double, h: java.lang.Double) if h > l =>
          // width_bucket: 0 below lo, n+1 above hi, 1..n inside → clamp
          // into [0, n-1]
          greatest(least(
            width_bucket(col(c).cast("double"), lit(l), lit(h), lit(n)) - 1,
            lit(n - 1L)), lit(0L))
        case _ => lit(0L) // constant / all-null / empty column
      }
    }
    interleave_bits(array(buckets.map(coalesce(_, lit(0L))): _*), bits)
  }

  /** Arrange `df` for a z-clustered write: range-partition + sort by the
    * z-value, which the written files inherit as row order; the helper
    * column is dropped before the write. Feed the result to
    * `GraftTable.append` (no extra sortBy — the order is already in the
    * partitioning). */
  def arrange(df: DataFrame, cols: Seq[String], bits: Int = 12,
      numFiles: Option[Int] = None): DataFrame = {
    val z = zvalue(df, cols, bits)
    val withZ = df.withColumn("__z", z)
    (numFiles match {
      case Some(k) => withZ.repartitionByRange(k, col("__z"))
      case None => withZ.repartitionByRange(col("__z"))
    }).sortWithinPartitions(col("__z")).drop("__z")
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-spec bucket hashing (spec Appendix B: "Bucket Transform
  * Requirements"): 32-bit Murmur3 (x86 variant, seed 0) over the value's
  * Iceberg byte encoding, then `(hash & Int.MaxValue) % n`.
  *
  * Per the spec's hash-function table:
  *   - int/long/date/time/timestamp[tz]: the value widened to long,
  *     hashed as its 8-byte little-endian encoding;
  *   - string: UTF-8 bytes;
  *   - binary/fixed: the bytes as-is;
  *   - decimal: the unscaled value's minimal two's-complement big-endian
  *     bytes (`BigInteger.toByteArray`);
  *   - float/double: NOT bucketable (the spec forbids it — NaN/-0.0
  *     make the hash ill-defined) — refused at bind time.
  *
  * This is the hash the reference's external consumers (Athena, Spark's
  * Iceberg integration, StarRocks — /root/reference/README.md:127-197)
  * apply when pruning a `bucket[n]`-partitioned table, so a layout
  * hashed THIS way can export a truthful bucket partition spec.
  */
object IcebergBucketHash {

  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  private def mixK1(k: Int): Int =
    Integer.rotateLeft(k * C1, 15) * C2

  private def mixH1(h1: Int, k1: Int): Int =
    Integer.rotateLeft(h1 ^ k1, 13) * 5 + 0xe6546b64

  private def fmix(h: Int, len: Int): Int = {
    var h1 = h ^ len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^ (h1 >>> 16)
  }

  /** murmur3_x86_32(seed 0) of the long's 8-byte little-endian encoding
    * — two 4-byte blocks, no tail. Iceberg hashes int (and date) by
    * widening to long first, so `hash(34: Int) == hash(34L)`. */
  def hashLong(v: Long): Int =
    fmix(mixH1(mixH1(0, mixK1(v.toInt)), mixK1((v >>> 32).toInt)), 8)

  /** murmur3_x86_32(seed 0) of raw bytes (string UTF-8, binary, decimal
    * unscaled big-endian). */
  def hashBytes(data: Array[Byte]): Int = {
    val len = data.length
    val nblocks = len >>> 2
    var h1 = 0
    var i = 0
    while (i < nblocks) {
      val b = i << 2
      val k = (data(b) & 0xff) | ((data(b + 1) & 0xff) << 8) |
        ((data(b + 2) & 0xff) << 16) | ((data(b + 3) & 0xff) << 24)
      h1 = mixH1(h1, mixK1(k))
      i += 1
    }
    val tail = nblocks << 2
    var k1 = 0
    val rem = len & 3
    if (rem == 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) { k1 ^= data(tail) & 0xff; h1 ^= mixK1(k1) }
    fmix(h1, len)
  }

  /** Iceberg bucket partition value: non-negative hash mod n. */
  def bucket(hash: Int, n: Int): Int = (hash & Int.MaxValue) % n

  def bucketLong(v: Long, n: Int): Int = bucket(hashLong(v), n)
  def bucketBytes(b: Array[Byte], n: Int): Int = bucket(hashBytes(b), n)
  def bucketUtf8(s: UTF8String, n: Int): Int = bucket(hashBytes(s.getBytes), n)
  def bucketDecimal(d: Decimal, n: Int): Int =
    bucket(hashBytes(d.toJavaBigDecimal.unscaledValue.toByteArray), n)

  def supports(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | ShortType | ByteType | DateType |
         TimestampType | TimestampNTZType | StringType | BinaryType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Driver-side bucket of a Spark-INTERNAL value (UTF8String / Decimal /
    * Int days / Long micros) — must agree exactly with the executor-side
    * [[IcebergBucketExpr]] so directory values and pruning probes match. */
  def bucketValue(v: Any, dt: DataType, n: Int): Int = dt match {
    case IntegerType | DateType => bucketLong(v.asInstanceOf[Int].toLong, n)
    case ShortType => bucketLong(v.asInstanceOf[Short].toLong, n)
    case ByteType => bucketLong(v.asInstanceOf[Byte].toLong, n)
    case LongType | TimestampType | TimestampNTZType =>
      bucketLong(v.asInstanceOf[Long], n)
    case StringType => bucketUtf8(v.asInstanceOf[UTF8String], n)
    case BinaryType => bucketBytes(v.asInstanceOf[Array[Byte]], n)
    case _: DecimalType => bucketDecimal(v.asInstanceOf[Decimal], n)
    case other => throw new IllegalArgumentException(
      s"bucket() unsupported for type $other (Iceberg forbids bucketing " +
        "float/double; cast or choose another transform)")
  }
}

/** Codegen'd Iceberg bucket expression: `iceberg_bucket(col, n)` →
  * int in [0, n). Used as the write-side derived partition column for
  * `bucket(n, col)` hidden partitioning, and usable standalone for
  * bucket-colocated joins that must line up with an Iceberg layout. */
case class IcebergBucketExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, s"bucket count must be positive: $n")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (IcebergBucketHash.supports(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"iceberg_bucket does not support type ${child.dataType} " +
          "(float/double are not bucketable per the Iceberg spec)")

  override def nullSafeEval(input: Any): Any =
    IcebergBucketHash.bucketValue(input, child.dataType, n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val call: String => String = child.dataType match {
      case IntegerType | ShortType | ByteType | DateType =>
        c => s"graft.functions.NativeOps.icebergBucketLong((long) $c, $n)"
      case LongType | TimestampType | TimestampNTZType =>
        c => s"graft.functions.NativeOps.icebergBucketLong($c, $n)"
      case StringType =>
        c => s"graft.functions.NativeOps.icebergBucketUtf8($c, $n)"
      case BinaryType =>
        c => s"graft.functions.NativeOps.icebergBucketBytes($c, $n)"
      case _: DecimalType =>
        c => s"graft.functions.NativeOps.icebergBucketDecimal($c, $n)"
      case other => throw new IllegalStateException(
        s"iceberg_bucket codegen on unchecked type $other")
    }
    defineCodeGen(ctx, ev, call)
  }

  override protected def withNewChildInternal(c: Expression)
      : IcebergBucketExpr = copy(child = c)
}

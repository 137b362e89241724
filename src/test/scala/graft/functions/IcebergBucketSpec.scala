package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.GraftSqlGlue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec

/** Iceberg Appendix-B bucket hash: pinned against the PUBLISHED spec test
  * vectors (the "Bucket transform requirements" hash-result table in the
  * Iceberg table spec), so graft's bucket dirs agree bit-for-bit with
  * what any conforming external engine computes when pruning `bucket[n]`.
  */
class IcebergBucketSpec extends SparkSpec {
  import spark.implicits._
  import IcebergBucketHash._

  test("murmur3 hash matches the published Iceberg spec vectors") {
    assert(hashLong(34L) === 2017239379)                // int/long 34
    assert(hashLong(17486L) === -653330422)             // date 2017-11-16
    assert(hashLong(81068000000L) === -662762989)       // time 22:31:08
    assert(hashLong(1510871468000000L) === -2047944441) // ts 2017-11-16T22:31:08
    assert(hashBytes("iceberg".getBytes("UTF-8")) === 1210000089)
    assert(hashBytes(Array[Byte](0, 1, 2, 3)) === -188683207)
    // decimal 14.20: unscaled 1420 as minimal two's-complement BE
    assert(hashBytes(java.math.BigInteger.valueOf(1420).toByteArray)
      === -500754589)
  }

  test("bucket value is non-negative and int widens like long") {
    assert(bucket(hashLong(34L), 16) === (2017239379 % 16))
    // negative hash → & MaxInt, not Math.abs
    assert(bucket(-653330422, 8) === ((-653330422 & Int.MaxValue) % 8))
    (0 until 100).foreach { i =>
      assert(bucketLong(i.toLong, 8) >= 0 && bucketLong(i.toLong, 8) < 8)
    }
  }

  test("executor expression and driver-side bucketValue agree per type") {
    val df = (1L to 200L).map(i =>
      (i, i.toInt, s"k$i", BigDecimal(i) / 100)).toDF("l", "i", "s", "d")
    def viaExpr(c: String, dt: DataType): Seq[Int] =
      df.select(GraftSqlGlue.column(
        IcebergBucketExpr(GraftSqlGlue.expression(col(c)), 16)))
        .as[Int].collect().toSeq
    val viaDriver = df.collect().toSeq.map { r =>
      (bucketLong(r.getLong(0), 16), bucketLong(r.getInt(1).toLong, 16),
        bucketValue(UTF8String.fromString(r.getString(2)), StringType, 16),
        bucketValue(Decimal(r.getDecimal(3)),
          DecimalType(38, 18), 16))
    }
    assert(viaExpr("l", LongType) === viaDriver.map(_._1))
    assert(viaExpr("i", IntegerType) === viaDriver.map(_._2))
    assert(viaExpr("s", StringType) === viaDriver.map(_._3))
    assert(viaExpr("d", DecimalType(38, 18)) === viaDriver.map(_._4))
    // int 34 and long 34 land in the same bucket (spec: int hashes as long)
    assert(viaExpr("i", IntegerType).zip(viaExpr("l", LongType))
      .forall { case (a, b) => a === b })
  }

  test("float/double are refused (spec forbids bucketing them)") {
    val df = Seq(1.0, 2.0).toDF("x")
    val e = intercept[Exception] {
      df.select(GraftSqlGlue.column(
        IcebergBucketExpr(GraftSqlGlue.expression(col("x")), 8))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("bucket"))
  }
}

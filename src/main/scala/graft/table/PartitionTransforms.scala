package graft.table

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.GraftSqlGlue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hidden-partitioning transforms (the Iceberg partition-spec shape):
  * a partition column spec is either a bare column name (identity — the
  * classic Hive layout, column moves into the directory) or a TRANSFORM
  * of a source column:
  *
  *   years(ts)         → dir column `ts_year` = UTC calendar year (int)
  *   months(ts)        → dir column `ts_month` = "yyyy-MM" of ts (UTC)
  *   days(ts)          → dir column `ts_day` = UTC date of ts
  *   hours(ts)         → dir column `ts_hour` = "yyyy-MM-dd-HH" (UTC) —
  *                       the natural refinement of a date-partitioned
  *                       event-time streaming layout
  *   bucket(16, id)    → dir column `id_bucket16m` = Iceberg Appendix-B
  *                       bucket: (murmur3_x86_32(id) & MaxInt) % 16
  *   truncate(4, name) → dir column `name_trunc` = prefix/floor of width 4
  *
  * Choose granularity so the partition COUNT stays bounded: days() over a
  * multi-year range explodes into thousands of directories of tiny files
  * (the classic Iceberg mis-partitioning); months()/bucket() keep the dir
  * count proportional to what the workload actually prunes by.
  *
  * The SOURCE column stays in the data files; the derived value exists
  * only in the directory layout — queries keep filtering on the source
  * column and the scan prunes directories through the transform, so the
  * manual derived-column dance the reference hand-rolls
  * (/root/reference/raw-bronze.py:205-212: a `processed_date` column
  * added just to partition by it) becomes automatic.
  *
  * Write-side expressions and driver-side value transforms are built
  * from the SAME primitives (UTC Cast, xxhash64, SQL substring), so a
  * directory value and a transformed predicate literal always agree. */
sealed trait PartTransform
object PartTransform {
  case object Identity extends PartTransform
  case object Years extends PartTransform
  case object Days extends PartTransform
  case object Months extends PartTransform
  case object Hours extends PartTransform
  case class Bucket(n: Int) extends PartTransform
  case class Truncate(w: Int) extends PartTransform
}

case class PartitionField(source: String, transform: PartTransform) {
  import PartTransform._
  /** Directory column name. Parameterized transforms embed the parameter
    * (`c_bucket8m`, not `c_bucket`): under partition spec evolution a
    * re-parameterized transform (bucket(8)→bucket(16)) must NOT read old
    * dirs as its own — hash%16 compared against a hash%8 dir value would
    * prune files that DO contain matches. Distinct names make old dirs
    * invisible to the new spec's pruning (conservatively kept). The `m`
    * suffix versions the HASH FUNCTION the same way: buckets switched
    * from xxhash64 to Iceberg murmur3 (so bucket layouts export a
    * truthful `bucket[n]` spec), and any dir written under the old hash
    * must likewise be invisible to the new pruning. */
  def physName: String = transform match {
    case Identity => source
    case Years => s"${source}_year"
    case Days => s"${source}_day"
    case Months => s"${source}_month"
    case Hours => s"${source}_hour"
    case Bucket(n) => s"${source}_bucket${n}m"
    case Truncate(w) => s"${source}_trunc$w"
  }
  def isIdentity: Boolean = transform == Identity
}

object PartitionTransforms {
  import PartTransform._

  private val YearsRe = """years\(\s*([A-Za-z0-9_]+)\s*\)""".r
  private val DaysRe = """days\(\s*([A-Za-z0-9_]+)\s*\)""".r
  private val MonthsRe = """months\(\s*([A-Za-z0-9_]+)\s*\)""".r
  private val HoursRe = """hours\(\s*([A-Za-z0-9_]+)\s*\)""".r
  private val BucketRe = """bucket\(\s*(\d+)\s*,\s*([A-Za-z0-9_]+)\s*\)""".r
  private val TruncRe = """truncate\(\s*(\d+)\s*,\s*([A-Za-z0-9_]+)\s*\)""".r

  def parse(spec: String): PartitionField = spec.trim match {
    case YearsRe(c) => PartitionField(c, Years)
    case DaysRe(c) => PartitionField(c, Days)
    case MonthsRe(c) => PartitionField(c, Months)
    case HoursRe(c) => PartitionField(c, Hours)
    case BucketRe(n, c) => PartitionField(c, Bucket(n.toInt))
    case TruncRe(w, c) => PartitionField(c, Truncate(w.toInt))
    case c => PartitionField(c, Identity)
  }

  /** Split a comma-separated partition spec list, ignoring commas inside
    * transform parens — "days(ts),bucket(16, id)" → two specs. */
  def splitSpecs(s: String): Seq[String] =
    s.split(""",(?![^(]*\))""").map(_.trim).filter(_.nonEmpty).toSeq

  /** Reject transform/source-type pairs the DRIVER-side value transform
    * ([[applyToValue]]) cannot evaluate, at table-CREATE/spec-evolution
    * time rather than first pruned read. Without this, hours(d) on a
    * DateType column WRITES fine (columnFor casts implicitly) but every
    * partition-pruned read then throws — data lands in a layout no query
    * can use. The accepted sets mirror applyToValue's match arms exactly;
    * hours() additionally has no honest DateType meaning (a date has no
    * hour — and the write-side cast would make the dirs session-zone
    * dependent), so it requires a timestamp source. */
  def validateSourceType(f: PartitionField, srcType: DataType): Unit = {
    def fail(t: String): Nothing = throw new IllegalArgumentException(
      s"$t(${f.source}) unsupported for source type ${srcType.simpleString}")
    f.transform match {
      case Identity => ()
      case Years => srcType match {
        case TimestampType | TimestampNTZType | DateType => ()
        case _ => fail("years") }
      case Months => srcType match {
        case TimestampType | TimestampNTZType | DateType => ()
        case _ => fail("months") }
      case Days => srcType match {
        case TimestampType | TimestampNTZType | DateType => ()
        case _ => fail("days") }
      case Hours => srcType match {
        case TimestampType | TimestampNTZType => (); case _ => fail("hours") }
      case Bucket(_) => () // IcebergBucketHash covers all bucketable types
      case Truncate(w) => srcType match {
        case StringType | LongType | IntegerType => ()
        case _ => fail(s"truncate($w,)") }
    }
  }

  /** The derived column's type in the directory layout. */
  def physType(f: PartitionField, srcType: DataType): DataType =
    f.transform match {
      case Identity => srcType
      case Years => IntegerType // calendar year: int order is monotone
      case Days => DateType
      case Months => StringType // "yyyy-MM": zero-padded, so ordering is monotone
      case Hours => StringType // "yyyy-MM-dd-HH": zero-padded, monotone
      case Bucket(_) => IntegerType
      case Truncate(_) => srcType
    }

  /** Write-side derived partition column (UTC-deterministic). */
  def columnFor(f: PartitionField, src: Column, srcType: DataType): Column =
    f.transform match {
      case Identity => src
      case Years =>
        val d = GraftSqlGlue.column(org.apache.spark.sql.catalyst.expressions
          .Cast(GraftSqlGlue.expression(src), DateType, Some("UTC")))
        year(d)
      case Hours =>
        // date part via the same UTC cast as Days; hour via the catalyst
        // Hour expression with an EXPLICIT zone (the functions.hour
        // builder follows the session zone and would disagree with the
        // driver-side pruning transform under a non-UTC session)
        val d = GraftSqlGlue.column(org.apache.spark.sql.catalyst.expressions
          .Cast(GraftSqlGlue.expression(src), DateType, Some("UTC")))
        val h = GraftSqlGlue.column(org.apache.spark.sql.catalyst.expressions
          .Hour(GraftSqlGlue.expression(src), Some("UTC")))
        concat(lpad(year(d).cast("string"), 4, "0"), lit("-"),
          lpad(month(d).cast("string"), 2, "0"), lit("-"),
          lpad(dayofmonth(d).cast("string"), 2, "0"), lit("-"),
          lpad(h.cast("string"), 2, "0"))
      case Days =>
        // explicit-UTC cast, NOT to_date (which follows the session zone
        // and would disagree with the driver-side pruning transform)
        GraftSqlGlue.column(org.apache.spark.sql.catalyst.expressions.Cast(
          GraftSqlGlue.expression(src), DateType, Some("UTC")))
      case Months =>
        // year()/month() of a DATE are zone-free; the UTC cast happens
        // first, mirroring Days — lpad keeps the string monotone
        val d = GraftSqlGlue.column(org.apache.spark.sql.catalyst.expressions
          .Cast(GraftSqlGlue.expression(src), DateType, Some("UTC")))
        concat(lpad(year(d).cast("string"), 4, "0"), lit("-"),
          lpad(month(d).cast("string"), 2, "0"))
      case Bucket(n) => GraftSqlGlue.column(
        graft.functions.IcebergBucketExpr(GraftSqlGlue.expression(src), n))
      case Truncate(w) => srcType match {
        case StringType => substring(src, 1, w)
        case LongType | IntegerType | ShortType | ByteType =>
          (src - pmod(src, lit(w))).cast(srcType.catalogString)
        case other => throw new IllegalArgumentException(
          s"truncate($w, ${f.source}) unsupported for type $other")
      }
    }

  /** Driver-side transform of a Spark-INTERNAL source value — must agree
    * exactly with [[columnFor]]'s executor-side result. */
  def applyToValue(f: PartitionField, srcType: DataType, v: Any): Any =
    f.transform match {
      case Identity => v
      case Years =>
        val days = srcType match {
          case TimestampType | TimestampNTZType =>
            Math.floorDiv(v.asInstanceOf[Long], 86400000000L)
          case DateType => v.asInstanceOf[Int].toLong
          case other => throw new IllegalArgumentException(
            s"years(${f.source}) unsupported for type $other")
        }
        java.time.LocalDate.ofEpochDay(days).getYear
      case Hours => srcType match {
        case TimestampType | TimestampNTZType =>
          val hrs = Math.floorDiv(v.asInstanceOf[Long], 3600000000L)
          val ldt = java.time.LocalDateTime.ofEpochSecond(
            hrs * 3600L, 0, java.time.ZoneOffset.UTC)
          UTF8String.fromString(f"${ldt.getYear}%04d-" +
            f"${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d-" +
            f"${ldt.getHour}%02d")
        case other => throw new IllegalArgumentException(
          s"hours(${f.source}) unsupported for type $other")
      }
      case Days => srcType match {
        case TimestampType | TimestampNTZType => // micros → (UTC) days
          Math.floorDiv(v.asInstanceOf[Long], 86400000000L).toInt
        case DateType => v
        case other => throw new IllegalArgumentException(
          s"days(${f.source}) unsupported for type $other")
      }
      case Months =>
        val days = srcType match {
          case TimestampType | TimestampNTZType =>
            Math.floorDiv(v.asInstanceOf[Long], 86400000000L).toLong
          case DateType => v.asInstanceOf[Int].toLong
          case other => throw new IllegalArgumentException(
            s"months(${f.source}) unsupported for type $other")
        }
        val ld = java.time.LocalDate.ofEpochDay(days)
        UTF8String.fromString(f"${ld.getYear}%04d-${ld.getMonthValue}%02d")
      case Bucket(n) =>
        graft.functions.IcebergBucketHash.bucketValue(v, srcType, n)
      case Truncate(w) => srcType match {
        case StringType => v.asInstanceOf[UTF8String].substringSQL(1, w)
        case LongType =>
          val x = v.asInstanceOf[Long]; x - Math.floorMod(x, w.toLong)
        case IntegerType =>
          val x = v.asInstanceOf[Int]; x - Math.floorMod(x, w)
        case other => throw new IllegalArgumentException(
          s"truncate($w, ${f.source}) unsupported for type $other")
      }
    }

  /** Can a file whose directory carries `dirValue` for this field contain
    * a row satisfying `<source> <cmp> <v>`? days/months/truncate are
    * monotone non-decreasing, so range predicates map through the
    * transform; bucket prunes equality only. `v` is Spark-internal. */
  def mayMatch(f: PartitionField, dirValue: String, srcType: DataType,
      cmp: String, v: Any): Boolean = {
    if (v == null) return true
    val pt = physType(f, srcType)
    val p = GraftSqlGlue.castFromString(dirValue, pt)
    if (p == null) return true
    val tv =
      try applyToValue(f, srcType, v)
      catch { case _: IllegalArgumentException => return true }
    val ord = GraftSqlGlue.interpretedOrdering(pt)
    f.transform match {
      case Bucket(_) =>
        cmp match { case "=" => ord.equiv(p, tv); case _ => true }
      case _ => cmp match {
        case "=" => ord.equiv(p, tv)
        case "<" | "<=" => ord.lteq(p, tv) // x<v ⟹ T(x) ≤ T(v)
        case ">" | ">=" => ord.gteq(p, tv)
        case _ => true
      }
    }
  }
}

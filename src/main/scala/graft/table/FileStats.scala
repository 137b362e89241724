package graft.table

import org.apache.spark.sql.graftglue.GraftSqlGlue
import org.apache.spark.sql.types._

/** Range logic over the snapshot log's per-file column stats ([[ColStat]]).
  *
  * Values are rendered with Spark's Cast-to-string (UTC) at write time and
  * parsed back with the same Cast here, then compared with Spark's own
  * interpreted ordering for the column type — the exact discipline
  * partition-path values use, so numerics, dates, timestamps and decimals
  * all compare correctly (string-lexicographic comparison would not).
  */
object FileStats {

  /** Column types stats are collected for. Binary/arrays/structs are
    * excluded (not meaningfully range-comparable here) — but a STRUCT's
    * scalar LEAVES are stat-typed under their dotted path
    * ([[leafStatFields]]). */
  def isStatType(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case StringType | BooleanType | DateType | TimestampType => true
    case _ => false
  }

  /** The stat-typed LEAF fields of a schema: top-level scalars under
    * their plain names, struct leaves at any depth under their DOTTED
    * path — exactly the name parquet footers use for the column chunk
    * (`ColumnPath.toDotString`), so [[FooterStats.read]] picks nested
    * bounds up with no further mapping. Collections are skipped (their
    * parquet paths insert list/element segments and element bounds say
    * nothing row-wise). `exclude` drops top-level names (identity
    * partition sources, which leave the data files). */
  def leafStatFields(schema: StructType,
      exclude: Set[String] = Set.empty): Seq[StructField] = {
    def walk(dt: DataType, path: String): Seq[StructField] = dt match {
      case st: StructType => st.fields.toSeq.flatMap(c =>
        walk(c.dataType, s"$path.${c.name}"))
      case t if isStatType(t) =>
        Seq(StructField(path, t, nullable = true))
      case _ => Seq.empty
    }
    val top = schema.fieldNames.toSet
    schema.fields.toSeq.filterNot(f => exclude.contains(f.name))
      .flatMap { f =>
        // a dotted leaf path that collides with a LITERAL top-level
        // column name is dropped — the string-keyed stats map can't
        // tell them apart, and wrong-type bounds could wrongly prune
        val ls = walk(f.dataType, f.name)
        if (f.dataType.isInstanceOf[StructType])
          ls.filterNot(l => top.contains(l.name))
        else ls
      }
  }

  /** The Spark type at a (possibly dotted) path: an EXACT top-level
    * column name first (a column may literally contain a dot), then
    * the struct-leaf walk — the pruning-time resolver for
    * [[leafStatFields]] keys. None for collection slots or missing
    * names. */
  def leafType(schema: StructType, path: String): Option[DataType] = {
    def walk(dt: DataType, rest: List[String]): Option[DataType] =
      (dt, rest) match {
        case (t, Nil) => Some(t)
        case (st: StructType, h :: tail) =>
          st.fields.find(_.name == h).flatMap(f => walk(f.dataType, tail))
        case _ => None
      }
    schema.fields.find(_.name == path).map(_.dataType)
      .orElse(walk(schema, path.split('.').toList))
  }

  /** Strings longer than this are not recorded as bounds — a truncated
    * max would no longer be an upper bound, so long strings simply opt
    * the file out of pruning on that column. */
  val MaxStringStatLength = 64

  /** Can a file with `stat` bounds contain a value in [lo, hi]? A missing
    * bound on either side means "unknown" → must answer true. */
  def rangesOverlap(dt: DataType, stat: ColStat,
      lo: Option[String], hi: Option[String]): Boolean = {
    val ord = GraftSqlGlue.interpretedOrdering(dt)
    def v(s: String): Any = GraftSqlGlue.castFromString(s, dt)
    val disjointBelow = (stat.max, lo) match {
      case (Some(mx), Some(l)) =>
        val (a, b) = (v(mx), v(l)); a != null && b != null && ord.lt(a, b)
      case _ => false
    }
    val disjointAbove = (stat.min, hi) match {
      case (Some(mn), Some(h)) =>
        val (a, b) = (v(mn), v(h)); a != null && b != null && ord.gt(a, b)
      case _ => false
    }
    !disjointBelow && !disjointAbove
  }

  /** Point/directional predicates against a file's stat. `cmp` is one of
    * "=", "<", "<=", ">", ">=" with the file's column on the LEFT.
    * Equality additionally consults the Bloom bitset when present —
    * the decisive check when file value RANGES overlap (unclustered
    * writes) and min/max alone keeps every file. */
  def mayMatch(dt: DataType, stat: ColStat, cmp: String, value: Any): Boolean = {
    if (value == null) return true
    val ord = GraftSqlGlue.interpretedOrdering(dt)
    def bound(s: Option[String]): Option[Any] =
      s.map(GraftSqlGlue.castFromString(_, dt)).filter(_ != null)
    val mn = bound(stat.min)
    val mx = bound(stat.max)
    cmp match {
      case "=" =>
        mn.forall(m => ord.lteq(m, value)) &&
          mx.forall(m => ord.gteq(m, value)) &&
          stat.bloom.forall { b64 =>
            graft.functions.AggExpressions.BloomAgg.mightContain(
              decodeBloom(b64), GraftSqlGlue.xxhash64Of(value, dt),
              graft.functions.AggExpressions.BloomAgg.DefaultProbes)
          }
      case "<" => mn.forall(m => ord.lt(m, value))
      case "<=" => mn.forall(m => ord.lteq(m, value))
      case ">" => mx.forall(m => ord.gt(m, value))
      case ">=" => mx.forall(m => ord.gteq(m, value))
      case _ => true
    }
  }

  def encodeBloom(bits: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(8 * bits.length)
    bits.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  def decodeBloom(b64: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(b64)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }
}

package graft.table

import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}

/** Stable per-column field ids, carried in StructField metadata through
  * the snapshot log's schema JSON (they round-trip `StructType.json`
  * losslessly).
  *
  * Two keys are written per field: `graft.field.id` (the engine's
  * identity — survives RENAME COLUMN, never reused after a drop) and
  * `parquet.field.id` (the key Spark's parquet writer emits into file
  * footers when `spark.sql.parquet.fieldId.write.enabled` is on, and
  * the reader matches on when `...read.enabled` is on and the requested
  * schema carries ids — SPARK-38094, the same mechanism Iceberg's Spark
  * integration uses). With ids in both the schema and the files, a
  * rename is a pure metadata commit: reads resolve every file by id, so
  * files written under the old name keep their column — no silent
  * null-fill, no per-file rewrite.
  *
  * Tables created before this feature have no ids (schemas are frozen
  * in their snapshot JSON); they keep name-mapped semantics and RENAME
  * stays refused for them until [[GraftTable.retrofitFieldIds]] rewrites
  * their live files with id-stamped footers (retrofitting ids without a
  * rewrite would be unsafe — id-based resolution has no name fallback). */
object FieldIds {

  val GraftKey = "graft.field.id"
  val ParquetKey = "parquet.field.id"

  def idOf(f: StructField): Option[Long] =
    if (f.metadata.contains(GraftKey)) Some(f.metadata.getLong(GraftKey))
    else None

  /** All fields carry an id — the gate for id-based reads and RENAME. */
  def hasIds(s: StructType): Boolean =
    s.fields.nonEmpty && s.fields.forall(idOf(_).isDefined)

  private def withId(f: StructField, id: Long): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong(GraftKey, id).putLong(ParquetKey, id).build())

  /** Fresh schema: ids 1..n in field order (no-op if already assigned —
    * a caller-supplied schema with ids is trusted, e.g. createFrom a
    * frame read off another graft table). */
  def assign(s: StructType): StructType =
    if (hasIds(s)) s
    else StructType(s.fields.zipWithIndex.map {
      case (f, i) => withId(f, i + 1L)
    })

  /** Ids for appended fields: strictly above `maxUsed`, in order —
    * never reusing a dropped column's id (its bytes live on in old
    * files; reuse would resurrect them under the new column). */
  def extend(fields: Seq[StructField], maxUsed: Long): Seq[StructField] = {
    var next = maxUsed
    fields.map { f =>
      if (idOf(f).isDefined) f
      else { next += 1; withId(f, next) }
    }
  }

  /** Highest id any schema in `schemas` ever used (0 when none). */
  def maxId(schemas: Iterable[StructType]): Long =
    schemas.iterator.flatMap(_.fields).flatMap(idOf)
      .foldLeft(0L)(math.max)

  /** id → field name lookup for a schema (empty when un-id'd). */
  def byId(s: StructType): Map[Long, String] =
    s.fields.flatMap(f => idOf(f).map(_ -> f.name)).toMap
}

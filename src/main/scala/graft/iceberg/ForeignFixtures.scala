package graft.iceberg

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hand-rolled writer of FOREIGN Iceberg metadata trees — shapes the
  * engine itself never produces (random non-monotonic snapshot ids,
  * transform-scoped equality deletes, v3 deletion-vector entries) but a
  * real multi-engine table can carry, per the public table spec
  * (the reference's premise: four engines over one table,
  * /root/reference/README.md:127-197). Used by oracle queries and specs
  * that must pin [[IcebergImport]]'s behavior on genuinely foreign
  * bytes; graft's own [[IcebergExport]] can't produce these shapes.
  * Local-filesystem paths only (fixtures, not a production writer). */
private[graft] object ForeignFixtures {

  /** One partition-spec field. `avroType` is the manifest tuple value's
    * Avro primitive ("int"/"long"/"string"/"double"/"boolean"). */
  case class SpecField(name: String, transform: String, sourceId: Int,
      avroType: String)

  sealed trait Entry { def seq: Long }
  /** Live data file; `tuple` = manifest partition values by spec-field
    * name; entries sharing a `group` land in the same manifest (so a
    * fixture can model multi-manifest snapshots — e.g. adopted legacy
    * manifests next to native ones). */
  case class Data(uri: String, rows: Long, seq: Long,
      tuple: Map[String, Any] = Map.empty, group: Int = 0,
      format: String = "PARQUET",
      bounds: Map[Int, (Array[Byte], Array[Byte])] = Map.empty)
    extends Entry
  /** v2 equality-delete file (parquet of the key columns; `format`
    * overridable to model foreign trees with non-parquet deletes). */
  case class EqDel(uri: String, rows: Long, seq: Long, eqIds: Seq[Int],
      tuple: Map[String, Any] = Map.empty,
      format: String = "PARQUET") extends Entry
  /** v2 position-delete file (parquet of file_path, pos). */
  case class PosDel(uri: String, rows: Long, seq: Long) extends Entry
  /** v3 deletion vector: a puffin blob slice holding the deleted
    * positions of exactly one data file. */
  case class Dv(puffinUri: String, dataFileUri: String, offset: Long,
      length: Long, rows: Long, seq: Long) extends Entry

  /** One snapshot; `entries` is the FULL live state at this snapshot
    * (manifest lists are cumulative per the spec). */
  case class Snap(id: Long, parent: Option[Long], seq: Long, op: String,
      entries: Seq[Entry], schemaId: Int = 0)

  /** Write `df` as a single parquet file `data/<name>.parquet` under
    * `location`; returns its file:// URI (the manifest-form path). */
  def writeParquet(spark: SparkSession, location: String, name: String,
      df: DataFrame): String = {
    val dataDir = new File(location, "data"); dataDir.mkdirs()
    val tmp = new File(new File(location), s"stage-$name")
    df.coalesce(1).write.parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = new File(dataDir, s"$name.parquet")
    require(part.renameTo(dest), s"stage move failed for $name")
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    s"file://${dest.getAbsolutePath}"
  }

  /** [[writeParquet]] in ORC — foreign trees fronted by ORC data files
    * (Hive-lineage Iceberg deployments). */
  def writeOrc(spark: SparkSession, location: String, name: String,
      df: DataFrame): String = {
    val dataDir = new File(location, "data"); dataDir.mkdirs()
    val tmp = new File(new File(location), s"stage-$name")
    df.coalesce(1).write.orc(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".orc")).get
    val dest = new File(dataDir, s"$name.orc")
    require(part.renameTo(dest), s"stage move failed for $name")
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    s"file://${dest.getAbsolutePath}"
  }

  private def fileLen(uri: String): Long =
    new File(new java.net.URI(uri).getPath).length()

  private val listSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"content","type":"int"},
      |{"name":"sequence_number","type":"long"},
      |{"name":"min_sequence_number","type":"long"},
      |{"name":"added_snapshot_id","type":"long"}
      |]}""".stripMargin)

  /** The v3 manifest-list entry: v2 plus nullable `first_row_id` — row
    * lineage's per-data-manifest starting row id. */
  private val listSchemaV3 = new Schema.Parser().parse(
    listSchema.toString(false).replace(
      """{"name":"added_snapshot_id","type":"long"}""",
      """{"name":"added_snapshot_id","type":"long"},""" +
        """{"name":"first_row_id","type":["null","long"],""" +
        """"default":null}"""))

  /** Manifest-entry schema with a partition record shaped by `spec` and
    * every optional field a foreign writer may use (equality ids, v3
    * deletion-vector coordinates) — unused ones stay null. */
  private def entrySchema(spec: Seq[SpecField]): Schema = {
    val part = spec.map(f =>
      s"""{"name":"${f.name}","type":["null","${f.avroType}"],"default":null}""")
      .mkString(",")
    new Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"snapshot_id","type":["null","long"],"default":null},
        |{"name":"sequence_number","type":["null","long"],"default":null},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"content","type":"int"},
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"partition","type":{"type":"record","name":"r102","fields":[$part]}},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"},
        |  {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null},
        |  {"name":"referenced_data_file","type":["null","string"],"default":null},
        |  {"name":"content_offset","type":["null","long"],"default":null},
        |  {"name":"content_size_in_bytes","type":["null","long"],"default":null},
        |  {"name":"lower_bounds","type":["null",{"type":"array","items":{"type":"record","name":"k125","fields":[{"name":"key","type":"int"},{"name":"value","type":"bytes"}]}}],"default":null},
        |  {"name":"upper_bounds","type":["null",{"type":"array","items":{"type":"record","name":"k128","fields":[{"name":"key","type":"int"},{"name":"value","type":"bytes"}]}}],"default":null}
        |]}}]}""".stripMargin)
  }

  private def writeAvro(path: File, schema: Schema,
      records: Seq[GenericRecord]): Long = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path)
    try records.foreach(w.append) finally w.close()
    path.length()
  }

  private def record(schema: Schema, snapId: Long, e: Entry)
      : GenericRecord = {
    val rec = new GenericData.Record(schema)
    rec.put("status", 1)
    rec.put("snapshot_id", snapId)
    rec.put("sequence_number", e.seq)
    val df = new GenericData.Record(schema.getField("data_file").schema())
    val part = new GenericData.Record(
      df.getSchema.getField("partition").schema())
    def tuple(t: Map[String, Any]): Unit = t.foreach { case (k, v) =>
      part.put(k, v) }
    e match {
      case d: Data =>
        df.put("content", 0)
        df.put("file_path", d.uri)
        df.put("file_format", d.format)
        df.put("record_count", d.rows)
        df.put("file_size_in_bytes", fileLen(d.uri))
        tuple(d.tuple)
        if (d.bounds.nonEmpty) {
          def kvList(which: String, pick: ((Array[Byte], Array[Byte]))
              => Array[Byte]): java.util.List[GenericRecord] = {
            val item = df.getSchema.getField(which).schema()
              .getTypes.get(1).getElementType
            d.bounds.toSeq.sortBy(_._1).map { case (fid, b) =>
              val r = new GenericData.Record(item)
              r.put("key", fid)
              r.put("value", java.nio.ByteBuffer.wrap(pick(b)))
              r: GenericRecord
            }.asJava
          }
          df.put("lower_bounds", kvList("lower_bounds", _._1))
          df.put("upper_bounds", kvList("upper_bounds", _._2))
        }
      case q: EqDel =>
        df.put("content", 2)
        df.put("file_path", q.uri)
        df.put("file_format", q.format)
        df.put("record_count", q.rows)
        df.put("file_size_in_bytes", fileLen(q.uri))
        df.put("equality_ids", q.eqIds.map(Int.box).asJava)
        tuple(q.tuple)
      case p: PosDel =>
        df.put("content", 1)
        df.put("file_path", p.uri)
        df.put("file_format", "PARQUET")
        df.put("record_count", p.rows)
        df.put("file_size_in_bytes", fileLen(p.uri))
      case v: Dv =>
        df.put("content", 1)
        df.put("file_path", v.puffinUri)
        df.put("file_format", "PUFFIN")
        df.put("record_count", v.rows)
        df.put("file_size_in_bytes", fileLen(v.puffinUri))
        df.put("referenced_data_file", v.dataFileUri)
        df.put("content_offset", v.offset)
        df.put("content_size_in_bytes", v.length)
    }
    df.put("partition", part)
    rec.put("data_file", df)
    rec
  }

  /** Publish metadata version `version` of the tree: per-snapshot
    * manifests + manifest lists, then `0000<version>-fixture.metadata
    * .json`. Call again with a higher version (and more snapshots) to
    * simulate the foreign engine committing — data files written earlier
    * stay in place, [[IcebergImport.resolveMetadataFile]] picks the
    * highest version. */
  def writeTree(location: String, schemasJson: Seq[String],
      currentSchemaId: Int, spec: Seq[SpecField], snaps: Seq[Snap],
      version: Int = 1, formatVersion: Int = 2,
      properties: Map[String, String] = Map.empty,
      lastColumnId: Int = 1000): Unit = {
    require(snaps.nonEmpty, "need at least one snapshot")
    val metaDir = new File(location, "metadata"); metaDir.mkdirs()
    def uri(f: File) = s"file://${f.getAbsolutePath}"
    val es = entrySchema(spec)
    val ls = if (formatVersion >= 3) listSchemaV3 else listSchema

    // v3 row lineage: data manifests are assigned first_row_id from a
    // running counter (advanced by each manifest's row count), and the
    // metadata publishes next-row-id past every assigned id — the shape
    // a native v3 writer leaves behind
    var rowIdCounter = 0L
    val snapJsons = snaps.zipWithIndex.map { case (s, i) =>
      val (dataEs, delEs) = s.entries.partition(_.isInstanceOf[Data])
      val dataManifests = dataEs.groupBy {
        case d: Data => d.group
        case _ => 0
      }.toSeq.sortBy(_._1).map { case (g, es) =>
        (es, 0, s"m-${s.id}-data-$g.avro")
      }
      val firstRowId = rowIdCounter
      val listRecs = (dataManifests :+
        ((delEs, 1, s"m-${s.id}-del.avro"))
      ).filter(_._1.nonEmpty).map { case (entries, content, name) =>
        val mf = new File(metaDir, name)
        val len = writeAvro(mf, es, entries.map(record(es, s.id, _)))
        val r = new GenericData.Record(ls)
        r.put("manifest_path", uri(mf))
        r.put("manifest_length", len)
        r.put("partition_spec_id", 0)
        r.put("content", content)
        r.put("sequence_number", s.seq)
        r.put("min_sequence_number",
          entries.map(_.seq).foldLeft(s.seq)(math.min))
        r.put("added_snapshot_id", s.id)
        if (formatVersion >= 3 && content == 0) {
          r.put("first_row_id", rowIdCounter)
          rowIdCounter += entries.collect { case d: Data => d.rows }.sum
        }
        r: GenericRecord
      }
      val listFile = new File(metaDir, s"snap-${s.id}.avro")
      writeAvro(listFile, ls, listRecs)
      val parent = s.parent.map(p =>
        s""""parent-snapshot-id": $p, """).getOrElse("")
      val frid = if (formatVersion >= 3)
        s""""first-row-id": $firstRowId, """ else ""
      s"""{"sequence-number": ${s.seq}, "snapshot-id": ${s.id}, $parent
        |$frid"timestamp-ms": ${1700000000000L + i * 1000},
        |"summary": {"operation": "${s.op}"}, "schema-id": ${s.schemaId},
        |"manifest-list": "${uri(listFile)}"}""".stripMargin
    }
    val specJson = spec.zipWithIndex.map { case (f, i) =>
      s"""{"name": "${f.name}", "transform": "${f.transform}",
        |"source-id": ${f.sourceId}, "field-id": ${1000 + i}}"""
        .stripMargin
    }.mkString(",")
    val props = properties.map { case (k, v) =>
      s""""$k": "$v"""" }.mkString(",")
    val cur = snaps.last
    val nextRowId = if (formatVersion >= 3)
      s""""next-row-id": $rowIdCounter,""" else ""
    val metaJson =
      s"""{"format-version": $formatVersion, $nextRowId
        |"table-uuid": "00000000-0000-0000-0000-00000000f1x7",
        |"location": "file://$location",
        |"last-sequence-number": ${snaps.map(_.seq).max},
        |"last-updated-ms": 1700000000000, "last-column-id": $lastColumnId,
        |"current-schema-id": $currentSchemaId,
        |"schemas": [${schemasJson.mkString(",")}],
        |"default-spec-id": 0,
        |"partition-specs": [{"spec-id": 0, "fields": [$specJson]}],
        |"last-partition-id": ${1000 + spec.size},
        |"default-sort-order-id": 0,
        |"sort-orders": [{"order-id": 0, "fields": []}],
        |"properties": {$props},
        |"current-snapshot-id": ${cur.id},
        |"refs": {"main": {"snapshot-id": ${cur.id}, "type": "branch"}},
        |"snapshots": [${snapJsons.mkString(",")}],
        |"snapshot-log": [], "metadata-log": []}""".stripMargin
    java.nio.file.Files.write(
      new File(metaDir, f"$version%05d-fixture.metadata.json").toPath,
      metaJson.getBytes("UTF-8"))
  }

  /** A flat scalar schema JSON: fields are (id, name, icebergType). */
  def schemaJson(schemaId: Int, fields: Seq[(Int, String, String)]): String =
    s"""{"type":"struct","schema-id":$schemaId,"fields":[""" +
      fields.map { case (id, n, t) =>
        s"""{"id":$id,"name":"$n","required":false,"type":"$t"}"""
      }.mkString(",") + "]}"

  /** [[schemaJson]] with RAW JSON types: each field's type is either a
    * quoted scalar (`"\"long\""`) or a nested type object built by
    * [[structType]] — the shape a nested-schema foreign writer leaves. */
  def schemaJsonTyped(schemaId: Int,
      fields: Seq[(Int, String, String)]): String =
    s"""{"type":"struct","schema-id":$schemaId,"fields":[""" +
      fields.map { case (id, n, t) =>
        s"""{"id":$id,"name":"$n","required":false,"type":$t}"""
      }.mkString(",") + "]}"

  /** Raw JSON of an Iceberg struct type whose fields are (id, name,
    * rawJsonType) — compose with [[schemaJsonTyped]]; nest freely. */
  def structType(fields: Seq[(Int, String, String)]): String =
    s"""{"type":"struct","fields":[""" +
      fields.map { case (id, n, t) =>
        s"""{"id":$id,"name":"$n","required":false,"type":$t}"""
      }.mkString(",") + "]}"

  /** Raw JSON of an Iceberg list type (element is a raw JSON type —
    * quoted scalar or a nested [[structType]]/[[listType]]/[[mapType]]). */
  def listType(elementId: Int, element: String): String =
    s"""{"type":"list","element-id":$elementId,""" +
      s""""element":$element,"element-required":false}"""

  /** Raw JSON of an Iceberg map type (key/value are raw JSON types). */
  def mapType(keyId: Int, key: String, valueId: Int,
      value: String): String =
    s"""{"type":"map","key-id":$keyId,"key":$key,""" +
      s""""value-id":$valueId,"value":$value,"value-required":false}"""
}

package graft.iceberg

import java.io.File
import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{Metadata => SqlMetadata}

/** Iceberg v2 WRITE-BACK: commit an APPEND into a FOREIGN Iceberg tree —
  * the write direction of the multi-engine loop whose read direction is
  * [[IcebergImport]]. The reference's premise is several engines sharing
  * one Iceberg table (/root/reference/README.md:127-197); with import
  * (read/follow/diff/stream) plus this, graft participates in both
  * directions with no Iceberg runtime jar: data parquet + one manifest +
  * one manifest list + the next metadata.json version, all by the public
  * table spec, leaving every existing snapshot/manifest byte untouched.
  *
  * Contract and refusals (fail-loud, never a silently-wrong tree):
  *   - v2 trees only, non-empty (a current snapshot must exist);
  *   - the default partition spec must be UNPARTITIONED or all-IDENTITY:
  *     appending under a hidden-transform spec would require evaluating
  *     the foreign transform exactly (any mismatch mis-prunes external
  *     readers), so it is refused;
  *   - the frame must carry exactly the current schema's columns (by
  *     name; values are cast to the schema's types);
  *   - a current snapshot holding a v1-style inline `manifests` array is
  *     refused (there is no manifest list to extend).
  *
  * New data files follow the TREE's column-resolution convention
  * (one footer sniff): id-ful trees get parquet field ids stamped from
  * the current schema (so later renames in the foreign engine keep
  * resolving our files), id-less trees (adopted files, graft's own
  * export) stay id-less name-resolved — the append never flips the tree
  * into the mixed mode that costs readers a distributed footer sniff.
  *
  * Existing manifests are CARRIED FORWARD by reference in the new
  * manifest list (their per-manifest partition summaries are dropped —
  * readers then read those manifests instead of skipping, conservative
  * and correct). Commit ordering per the spec: the new snapshot takes
  * `last-sequence-number + 1`, refs.main advances, the snapshot-log
  * appends. The metadata version file is written temp-then-rename and
  * never overwrites an existing version — a concurrent foreign commit
  * surfaces as a loud failure to publish, not a lost update.
  *
  * Scale shape: the data write is an ordinary distributed parquet write
  * (partitionBy for identity specs); driver-side work is O(new files)
  * footer reads plus O(existing manifests) list records — never a
  * manifest walk of the table's full file set. */
object IcebergWriteBack {

  /** Append `df` to the foreign tree at `tableLocation` as one v2
    * snapshot commit; returns the new snapshot id. */
  def appendTo(spark: SparkSession, tableLocation: String,
      df: DataFrame): Long = {
    import org.json4s._
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods.{compact, render}
    implicit val fmts: Formats = DefaultFormats

    val (fs, meta, metaFile) = IcebergImport.parseMeta(spark, tableLocation)
    require((meta \ "format-version").extractOpt[Int].contains(2),
      s"iceberg write-back needs a v2 tree (sequence numbers): $metaFile")
    val curId = (meta \ "current-snapshot-id").extractOpt[Long]
      .filter(_ != -1L).getOrElse(throw new IllegalStateException(
      s"$metaFile has no current snapshot — write-back appends to " +
        "established tables only"))
    val snapsJ = (meta \ "snapshots").children
    val curSnap = snapsJ.find(s =>
      (s \ "snapshot-id").extract[Long] == curId).getOrElse(
      throw new IllegalStateException(
        s"current snapshot $curId missing from $metaFile"))
    val oldListUri = (curSnap \ "manifest-list").extractOpt[String]
      .getOrElse(throw new IllegalArgumentException(
        "current snapshot carries a v1-style inline manifests array — " +
          "no manifest list to extend, write-back refuses"))

    // ---- current schema (names, iceberg field ids, types) ----
    val curSchemaId = (meta \ "current-schema-id").extractOpt[Int]
      .getOrElse(0)
    val schemaJ: JValue = (meta \ "schemas").children.find(s =>
      (s \ "schema-id").extractOpt[Int].contains(curSchemaId))
      .orElse((meta \ "schema").toOption)
      .getOrElse(throw new IllegalStateException(
        s"schema $curSchemaId not found in $metaFile"))
    val fields: Seq[(String, Int, String)] =
      (schemaJ \ "fields").children.map { f =>
        val t = (f \ "type") match {
          case JString(s) => s
          case other => throw new IllegalArgumentException(
            "write-back supports flat scalar columns only, got " +
              compact(render(other)))
        }
        ((f \ "name").extract[String], (f \ "id").extract[Int], t)
      }

    // ---- default partition spec: unpartitioned or all-identity ----
    val defaultSpecId = (meta \ "default-spec-id").extractOpt[Int]
      .getOrElse(0)
    val defSpecFields: Seq[JValue] = (meta \ "partition-specs").children
      .find(s => (s \ "spec-id").extractOpt[Int].contains(defaultSpecId))
      .map(s => (s \ "fields").children)
      .getOrElse((meta \ "partition-spec").children)
    val specTriples: Seq[(String, String, Int)] = defSpecFields.map(f =>
      ((f \ "name").extract[String], (f \ "transform").extract[String],
        (f \ "source-id").extract[Int]))
    require(specTriples.forall(_._2 == "identity"),
      s"write-back appends under identity/unpartitioned specs only; " +
        s"default spec $defaultSpecId has transforms " +
        specTriples.filter(_._2 != "identity").map(t =>
          s"${t._1}:${t._2}").mkString(", ") +
        " — appending would require evaluating the foreign transform " +
        "exactly; import the table instead")
    val nameById = fields.map(f => f._2 -> f._1).toMap
    val partCols: Seq[String] = specTriples.map(t =>
      nameById.getOrElse(t._3, throw new IllegalStateException(
        s"spec field ${t._1} references unknown source-id ${t._3}")))

    // ---- align the frame to the schema (names, order, types) ----
    val have = df.columns.toSet
    val want = fields.map(_._1).toSet
    require(have == want,
      s"frame columns must match the table schema exactly; " +
        s"missing=${(want -- have).mkString(",")} " +
        s"extra=${(have -- want).mkString(",")}")
    // match the tree's resolution convention: one footer sniff of one
    // existing live data file
    val plan0 = IcebergImport.plan(spark, tableLocation)
    val treeHasIds = plan0.files.headOption.exists(f =>
      IcebergImport.footerInfo(spark, f.uri).hasIds)
    val aligned = df.select(fields.map { case (n, id, t) =>
      val c = col(n).cast(IcebergImport.sparkType(t))
      if (treeHasIds) c.as(n,
        SqlMetadata.fromJson(s"""{"parquet.field.id": $id}"""))
      else c.as(n)
    }: _*)

    // ---- distributed data write ----
    val tableUri = fs.makeQualified(new Path(tableLocation))
      .toUri.toString.stripSuffix("/")
    val dataRel = s"data/graft-append-${UUID.randomUUID()}"
    val outDir = new Path(tableLocation, dataRel)
    val w = aligned.write.mode("errorifexists")
    if (partCols.nonEmpty) w.partitionBy(partCols: _*)
      .parquet(outDir.toString)
    else w.parquet(outDir.toString)

    val hadoopConf = spark.sessionState.newHadoopConf()
    val it = fs.listFiles(outDir, true)
    val newFiles = Seq.newBuilder[(String, Map[String, String], Long, Long)]
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && name.endsWith(".parquet")) {
        val full = st.getPath.toString
        val tail = full.substring(full.indexOf(dataRel))
        // hive dirs between dataRel and the file name carry the tuple
        val tuple = tail.stripPrefix(dataRel).stripPrefix("/")
          .split("/").dropRight(1).filter(_.contains("="))
          .map { kv =>
            val i = kv.indexOf('=')
            kv.take(i) -> java.net.URLDecoder.decode(kv.drop(i + 1),
              "UTF-8")
          }.toMap
        val rows = graft.table.FooterStats.read(hadoopConf, st.getPath,
          Seq.empty)._2
        newFiles += ((tail, tuple, rows, st.getLen))
      }
    }
    val files = newFiles.result()
    require(partCols.isEmpty || files.forall(f =>
      partCols.forall(f._2.contains)),
      "written files lack expected partition dirs (layout drift)")

    // ---- ids and sequence for the new commit ----
    val lastSeq = (meta \ "last-sequence-number").extractOpt[Long]
      .getOrElse(0L)
    val newSeq = lastSeq + 1
    val newId = snapsJ.map(s => (s \ "snapshot-id").extract[Long])
      .foldLeft(0L)(math.max) + 1
    val now = System.currentTimeMillis()

    // ---- new data manifest ----
    val typeById = fields.map(f => f._2 -> f._3).toMap
    val avroPartFields = specTriples.map { case (phys, _, srcId) =>
      phys -> IcebergExport.partitionAvroType(
        IcebergImport.sparkType(typeById(srcId)))
    }
    val entrySchema = IcebergExport.manifestEntrySchema(avroPartFields)
    val entries = files.map { case (rel, tuple, rows, len) =>
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1) // ADDED
      e.put("snapshot_id", newId)
      e.put("sequence_number", newSeq)
      e.put("file_sequence_number", newSeq)
      val dfr = new GenericData.Record(
        entrySchema.getField("data_file").schema())
      dfr.put("content", 0)
      dfr.put("file_path", s"$tableUri/$rel")
      dfr.put("file_format", "PARQUET")
      val part = new GenericData.Record(
        dfr.getSchema.getField("partition").schema())
      specTriples.foreach { case (phys, _, srcId) =>
        part.put(phys, IcebergExport.partitionValue(tuple(phys),
          IcebergImport.sparkType(typeById(srcId))))
      }
      dfr.put("partition", part)
      dfr.put("record_count", rows)
      dfr.put("file_size_in_bytes", len)
      e.put("data_file", dfr)
      e: GenericRecord
    }
    val metaDir = new Path(tableLocation, "metadata")
    val specFieldsJson = compact(render(JArray(defSpecFields.toList)))
    val manifestName = s"${UUID.randomUUID()}-m0.avro"
    val manifestLen = IcebergExport.writeAvro(
      new File(IcebergExport.localPath(fs, metaDir), manifestName),
      entrySchema, entries,
      Map("schema" -> compact(render(schemaJ)),
        "schema-id" -> curSchemaId.toString,
        "partition-spec" -> specFieldsJson,
        "partition-spec-id" -> defaultSpecId.toString,
        "format-version" -> "2", "content" -> "data"))

    // ---- manifest list: carry old manifests forward + the new one ----
    val mls = IcebergExport.manifestListSchema
    def carried(r: GenericRecord): GenericRecord = {
      val ml = new GenericData.Record(mls)
      def g(n: String): Option[AnyRef] =
        Option(r.getSchema.getField(n)).flatMap(_ => Option(r.get(n)))
      def gL(n: String, d: Long): Long =
        g(n).map(_.asInstanceOf[Number].longValue).getOrElse(d)
      def gI(n: String, d: Int): Int =
        g(n).map(_.asInstanceOf[Number].intValue).getOrElse(d)
      ml.put("manifest_path", g("manifest_path").map(_.toString)
        .getOrElse(throw new IllegalStateException(
          "manifest list record lacks manifest_path")))
      ml.put("manifest_length", gL("manifest_length", 0L))
      ml.put("partition_spec_id", gI("partition_spec_id", 0))
      ml.put("content", gI("content", 0))
      ml.put("sequence_number", gL("sequence_number", 0L))
      ml.put("min_sequence_number", gL("min_sequence_number", 0L))
      ml.put("added_snapshot_id", gL("added_snapshot_id", curId))
      ml.put("added_data_files_count", gI("added_data_files_count", 0))
      ml.put("existing_data_files_count",
        gI("existing_data_files_count", 0))
      ml.put("deleted_data_files_count",
        gI("deleted_data_files_count", 0))
      ml.put("added_rows_count", gL("added_rows_count", 0L))
      ml.put("existing_rows_count", gL("existing_rows_count", 0L))
      ml.put("deleted_rows_count", gL("deleted_rows_count", 0L))
      ml
    }
    val newMl = new GenericData.Record(mls)
    newMl.put("manifest_path", s"$tableUri/metadata/$manifestName")
    newMl.put("manifest_length", manifestLen)
    newMl.put("partition_spec_id", defaultSpecId)
    newMl.put("content", 0)
    newMl.put("sequence_number", newSeq)
    newMl.put("min_sequence_number", newSeq)
    newMl.put("added_snapshot_id", newId)
    newMl.put("added_data_files_count", files.size)
    newMl.put("existing_data_files_count", 0)
    newMl.put("deleted_data_files_count", 0)
    newMl.put("added_rows_count", files.map(_._3).sum)
    newMl.put("existing_rows_count", 0L)
    newMl.put("deleted_rows_count", 0L)
    val listRecords: Seq[GenericRecord] =
      IcebergImport.readAvro(fs, oldListUri).map(carried) :+ newMl
    val listName = s"snap-$newId-1-${UUID.randomUUID()}.avro"
    IcebergExport.writeAvro(
      new File(IcebergExport.localPath(fs, metaDir), listName),
      mls, listRecords, Map("format-version" -> "2"))

    // ---- next metadata.json version ----
    val entryJ: JObject =
      ("sequence-number" -> newSeq) ~
        ("snapshot-id" -> newId) ~
        ("parent-snapshot-id" -> curId) ~
        ("timestamp-ms" -> now) ~
        ("summary" -> (("operation" -> "append"): JObject)) ~
        ("manifest-list" -> s"$tableUri/metadata/$listName") ~
        ("schema-id" -> curSchemaId)
    val oldRefs: List[JField] = (meta \ "refs") match {
      case JObject(fs0) => fs0
      case _ => Nil
    }
    val newRefs = JObject(oldRefs.filterNot(_._1 == "main") :+
      ("main" -> (("snapshot-id" -> newId) ~
        ("type" -> "branch"): JObject)))
    val oldLog = (meta \ "snapshot-log").children
    val newLog = JArray(oldLog :+
      ((("timestamp-ms" -> now) ~ ("snapshot-id" -> newId)): JValue))
    val replaced = Set("last-updated-ms", "last-sequence-number",
      "current-snapshot-id", "snapshots", "snapshot-log", "refs")
    val kept = meta.asInstanceOf[JObject].obj
      .filterNot(f => replaced.contains(f._1))
    val updated = JObject(kept ++ List[JField](
      "last-updated-ms" -> JLong(now),
      "last-sequence-number" -> JLong(newSeq),
      "current-snapshot-id" -> JLong(newId),
      "snapshots" -> JArray(snapsJ :+ (entryJ: JValue)),
      "snapshot-log" -> newLog,
      "refs" -> newRefs))

    // version naming follows the tree's own family; publish by rename,
    // refusing to overwrite (a concurrent foreign commit fails loud)
    val oldName = metaFile.getName
    val newMetaName =
      if (oldName.matches("v\\d+\\.metadata\\.json")) {
        val v = oldName.stripPrefix("v")
          .stripSuffix(".metadata.json").toLong
        s"v${v + 1}.metadata.json"
      } else {
        val digits = oldName.takeWhile(_.isDigit)
        val next = (if (digits.isEmpty) 0L else digits.toLong) + 1
        f"$next%05d-${UUID.randomUUID()}.metadata.json"
      }
    val target = new Path(metaDir, newMetaName)
    require(!fs.exists(target),
      s"$target already exists — a concurrent commit published first; " +
        "re-read the table and retry")
    val tmp = new Path(metaDir, s".tmp-${UUID.randomUUID()}.metadata.json")
    val out = fs.create(tmp, false)
    try out.write(compact(render(updated))
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, target))
      throw new IllegalStateException(
        s"failed to publish $target (concurrent commit?); retry")
    val hint = new Path(metaDir, "version-hint.text")
    if (fs.exists(hint) && newMetaName.startsWith("v")) {
      val h = fs.create(hint, true)
      try h.write(newMetaName.stripPrefix("v")
        .stripSuffix(".metadata.json").getBytes(StandardCharsets.UTF_8))
      finally h.close()
    }
    newId
  }
}

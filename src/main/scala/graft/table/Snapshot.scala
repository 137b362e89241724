package graft.table

/** One committed table version — the graft analogue of an Iceberg snapshot
  * (reference relies on Iceberg's snapshot ids + `.history` metadata table,
  * /root/reference/bronze-silver.py:116-149).
  *
  * Stored as one JSON file per snapshot under `<table>/_graft/`, committed
  * by atomic rename — commit ordering and single-winner semantics come from
  * the filesystem, as in Iceberg's optimistic metadata swap. File lists are
  * relative paths so a table directory is relocatable.
  *
  * Scale note: metadata is O(files) per snapshot, like an Iceberg manifest.
  * At 100 TB the file lists would be split into manifest files; the commit
  * protocol (write-new, atomic-rename, retry on collision) is unchanged.
  */
/** Per-file, per-column min/max, rendered with Spark's Cast-to-string (in
  * UTC) and parsed back with the same Cast — the discipline partition-path
  * values already use. A missing bound means "no information" (readers
  * must keep the file); bounds are dropped for long strings rather than
  * truncated, because a truncated max is no longer an upper bound.
  * `bloom` is an optional base64 Bloom bitset over xxhash64 of the file's
  * values (point-lookup pruning where value ranges overlap across files —
  * the unclustered high-cardinality case min/max cannot serve). */
case class ColStat(min: Option[String], max: Option[String],
    bloom: Option[String] = None)

/** A merge-on-read equality-delete file (graft's analogue of an Iceberg
  * v2 equality delete): `path` is a parquet file of key tuples under
  * `_deletes/`, and its tombstones apply to data files whose add-sequence
  * is STRICTLY BELOW `seq` — data files committed with or after the
  * delete (e.g. the same merge's own inserts) are never affected. `seq`
  * is recorded explicitly so it survives snapshot expiration (the
  * baseline re-adds the delete file with its original sequence). */
case class DeleteFile(path: String, seq: Long)

case class Snapshot(
    snapshotId: Long,
    parentId: Option[Long],
    timestampMs: Long,
    operation: String, // create | append | overwrite | merge
    addedFiles: Seq[String],
    removedFiles: Seq[String],
    schemaJson: String,
    partitionCols: Seq[String],
    /** file → column → min/max for the files ADDED by this snapshot
      * (Iceberg's manifest column stats; Option so pre-stats snapshot JSON
      * still parses). */
    fileStats: Option[Map[String, Map[String, ColStat]]] = None,
    /** MOR delete files added / removed by this snapshot. */
    addedDeleteFiles: Option[Seq[DeleteFile]] = None,
    removedDeleteFiles: Option[Seq[String]] = None,
    /** row count per ADDED file (manifest record counts — drives the
      * metadata views and the auto COW/MOR decision). */
    fileRows: Option[Map[String, Long]] = None,
    /** add-sequence overrides for `addedFiles` (recorded by the expire
      * baseline, which re-adds files whose original adding snapshots are
      * gone — without this, carried files would appear newer than the
      * tombstones that target them and deleted rows would resurrect). */
    fileSeqs: Option[Map[String, Long]] = None,
    /** idempotent-writer transaction stamp (Delta's txnAppId/txnVersion
      * pattern): a writer that replays a micro-batch checks the chain for
      * its (appId, batchId) before committing — the stamp rides IN the
      * data commit, so the dedup check and the data are atomic. */
    txnAppId: Option[String] = None,
    txnBatchId: Option[Long] = None)

object Snapshot {
  import org.json4s._
  import org.json4s.jackson.Serialization

  private implicit val fmts: Formats = DefaultFormats

  def toJson(s: Snapshot): String = Serialization.writePretty(s)
  def fromJson(j: String): Snapshot = Serialization.read[Snapshot](j)
}

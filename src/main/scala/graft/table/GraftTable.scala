package graft.table

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** A versioned, partitioned Parquet table with Iceberg-like observable
  * semantics: snapshot isolation, append / overwrite / merge commits,
  * time travel, incremental append scans, and a `.history` metadata view.
  *
  * Re-expresses what the reference gets from the Iceberg runtime:
  *   - create/append/overwrite writer (/root/reference/raw-bronze.py:156-183)
  *   - declared-schema create       (/root/reference/bronze-silver.py:168-204)
  *   - history scan                 (/root/reference/bronze-silver.py:116-119)
  *   - snapshot-range incremental   (/root/reference/bronze-silver.py:146-149)
  *   - MERGE INTO upsert            (/root/reference/bronze-silver.py:249-286)
  *
  * Design: data files are plain Parquet laid out in Hive partition dirs;
  * each commit stages files to a scratch dir, moves them in, then atomically
  * publishes a [[Snapshot]] JSON. Readers resolve the live file set from the
  * snapshot chain, so uncommitted/aborted writes are invisible (snapshot
  * isolation) and concurrent commit attempts collide on the publish:
  * appends retry against the new tip, rewrites fail with a conflict
  * (Iceberg's validation semantics). All IO goes through the Hadoop
  * FileSystem API; the snapshot publish is single-winner via an atomic
  * create-exclusive primitive (POSIX link for file://, rename for HDFS
  * where rename-to-existing fails) — S3A would need a lock/catalog commit
  * service, exactly as Iceberg requires there.
  *
  * Scale notes (100 TB): reads prune partitions before listing a single data
  * file (the live-file set is filtered driver-side by partition values, like
  * Iceberg manifest pruning); merge rewrites only the partitions that can
  * contain a matched key (COW write amplification bounded by touched
  * partitions, not table size); incremental scans read exactly the files a
  * snapshot range added — no full-table diff.
  */
class GraftTable(spark: SparkSession, val location: String,
    val branchName: Option[String] = None) {

  private[graft] def sparkSession: SparkSession = spark

  private val tablePath = new Path(location)
  private val metaPath = new Path(tablePath, "_graft")
  private def fs: FileSystem =
    tablePath.getFileSystem(spark.sessionState.newHadoopConf())

  // ---- metadata ----

  def exists: Boolean = fs.exists(metaPath)

  /** This instance's snapshot slot name: branch commits publish
    * `snap-NNNNNNNN-<branch>.json`, invisible to the main chain's
    * `snap-\d{8}.json` listing by construction. */
  private def snapFileName(id: Long): String = branchName match {
    case Some(b) => f"snap-$id%08d-$b.json"
    case None => f"snap-$id%08d.json"
  }

  /** All committed snapshots, ascending by id. The directory is listed
    * fresh every call (that's the visibility point for concurrent
    * commits), but the per-file JSON parse is cached on
    * (path, mtime, length) — snapshot files are immutable once published
    * (only expire's baseline rewrite changes one, and that changes
    * mtime/length), and a single query plan resolves the chain several
    * times (schema, live files, stats, deletes). At manifest scale this
    * turns metadata resolution from O(chain) JSON parses per lookup into
    * one list call. */
  def snapshots: Seq[Snapshot] = branchName match {
    case None => snapshotsMatching("snap-\\d{8}\\.json")
    case Some(b) =>
      // a branch's chain = the main chain up to its fork point, then its
      // own suffixed commits — so every read/commit path (liveFiles,
      // schema, incremental, MOR, txn replay) works on a branch instance
      // through this one override
      val base = branchBase(b)
      snapshotsMatching("snap-\\d{8}\\.json")
        .takeWhile(_.snapshotId <= base) ++
        snapshotsMatching(s"snap-\\d{8}-${java.util.regex.Pattern.quote(b)}\\.json")
  }

  private def snapshotsMatching(regex: String): Seq[Snapshot] = {
    if (!exists) return Seq.empty
    // local fs: list + stat + read through java.nio — the chain is
    // resolved MANY times per query (schema, live files, stats, deletes,
    // txn replay) and Hadoop's LocalFileSystem charges checksum
    // bookkeeping per list/open; the listing is equally fresh either way
    // (same visibility point), and the parse cache keys stay
    // (absolute path, mtime, length)
    if (fs.getScheme == "file") {
      import scala.jdk.CollectionConverters._
      val dir = java.nio.file.Paths.get(metaPath.toUri.getPath)
      val stream = java.nio.file.Files.newDirectoryStream(dir)
      val names =
        try stream.iterator().asScala
          .map(_.getFileName.toString).filter(_.matches(regex)).toSeq.sorted
        finally stream.close()
      // a file vanishing between list and read (concurrent expire)
      // throws here exactly like the Hadoop path's fs.open would
      return names.map { n =>
        val p = dir.resolve(n)
        val attrs = java.nio.file.Files.readAttributes(
          p, classOf[java.nio.file.attribute.BasicFileAttributes])
        val key = (p.toString, attrs.lastModifiedTime.toMillis, attrs.size)
        val cached = GraftTable.snapCache.get(key)
        if (cached != null) cached
        else {
          val snap = Snapshot.fromJson(new String(
            java.nio.file.Files.readAllBytes(p), "UTF-8"))
          if (GraftTable.snapCache.size > GraftTable.SnapCacheMax)
            GraftTable.snapCache.clear()
          GraftTable.snapCache.put(key, snap)
          snap
        }
      }
    }
    val st = fs.listStatus(metaPath)
      .filter(s => s.getPath.getName.matches(regex))
      .sortBy(_.getPath.getName)
    st.map { s =>
      val key = (s.getPath.toString, s.getModificationTime, s.getLen)
      val cached = GraftTable.snapCache.get(key)
      if (cached != null) cached
      else {
        val in = fs.open(s.getPath)
        val snap = try {
          val bytes = new Array[Byte](s.getLen.toInt)
          in.readFully(bytes)
          Snapshot.fromJson(new String(bytes, "UTF-8"))
        } finally in.close()
        if (GraftTable.snapCache.size > GraftTable.SnapCacheMax)
          GraftTable.snapCache.clear() // crude bound; entries re-fill on use
        GraftTable.snapCache.put(key, snap)
        snap
      }
    }.toSeq
  }

  def latestSnapshot: Option[Snapshot] = snapshots.lastOption
  def latestSnapshotId: Option[Long] = latestSnapshot.map(_.snapshotId)

  // ---- manifests (chunked per-commit file metadata) ----

  private def readManifest(rel: String): Manifest = {
    val p = new Path(tablePath, rel)
    // local fs: stat + read via java.nio (same rationale and cache keys
    // as snapshotsMatching)
    if (fs.getScheme == "file") {
      val np = java.nio.file.Paths.get(tablePath.toUri.getPath, rel)
      val attrs = java.nio.file.Files.readAttributes(
        np, classOf[java.nio.file.attribute.BasicFileAttributes])
      val key = (np.toString, attrs.lastModifiedTime.toMillis, attrs.size)
      val cached = GraftTable.manifestCache.get(key)
      if (cached != null) return cached
      GraftTable.manifestParses.incrementAndGet()
      val m = Manifest.fromJson(new String(
        java.nio.file.Files.readAllBytes(np), "UTF-8"))
      if (GraftTable.manifestCache.size > GraftTable.SnapCacheMax)
        GraftTable.manifestCache.clear()
      GraftTable.manifestCache.put(key, m)
      return m
    }
    val st = fs.getFileStatus(p)
    val key = (p.toString, st.getModificationTime, st.getLen)
    val cached = GraftTable.manifestCache.get(key)
    if (cached != null) cached
    else {
      GraftTable.manifestParses.incrementAndGet()
      val in = fs.open(p)
      val m = try {
        val bytes = new Array[Byte](st.getLen.toInt)
        in.readFully(bytes)
        Manifest.fromJson(new String(bytes, "UTF-8"))
      } finally in.close()
      if (GraftTable.manifestCache.size > GraftTable.SnapCacheMax)
        GraftTable.manifestCache.clear()
      GraftTable.manifestCache.put(key, m)
      m
    }
  }

  /** A snapshot's per-file change set: its manifest's entries when
    * chunked; synthesized from the legacy inline fields otherwise (old
    * snapshot JSON keeps resolving unchanged). */
  def entriesOf(s: Snapshot): Seq[ManifestEntry] = s.manifest match {
    case Some(ref) => readManifest(ref.path).entries
    case None =>
      s.removedFiles.map(f => ManifestEntry(f, "remove")) ++
        s.addedFiles.map(f => ManifestEntry(f, "add",
          stats = s.fileStats.flatMap(_.get(f)),
          rows = s.fileRows.flatMap(_.get(f)),
          seq = s.fileSeqs.flatMap(_.get(f))))
  }

  def addedFilesOf(s: Snapshot): Seq[String] =
    entriesOf(s).filter(_.status == "add").map(_.path)
  def removedFilesOf(s: Snapshot): Seq[String] =
    entriesOf(s).filter(_.status == "remove").map(_.path)

  /** Cap on per-column distinct partition values a manifest summary
    * records; a wider manifest drops the summary and is always read. */
  private val MaxPartSummaryValues = 64

  /** Write a commit's manifest file and build its slim ref (entry counts +
    * partition-value summary for manifest skipping). The manifest is
    * content-addressed by UUID and immutable; an aborted commit leaves at
    * worst an unreferenced manifest, swept with the expired metadata. */
  private def writeManifest(entries: Seq[ManifestEntry],
      parts: Seq[String]): ManifestRef = {
    val rel = s"_graft/manifest-${UUID.randomUUID()}.json"
    val p = new Path(tablePath, rel)
    val out = fs.create(p, false)
    try out.write(Manifest.toJson(Manifest(entries)).getBytes("UTF-8"))
    finally out.close()
    val physNames = parts.map(PartitionTransforms.parse(_).physName)
    val summary: Option[Map[String, Seq[String]]] =
      if (physNames.isEmpty) None
      else {
        val maps = entries.map(e => partitionValues(e.path))
        if (maps.exists(m => !physNames.forall(m.contains))) None
        else {
          val per = physNames.map(pc =>
            pc -> maps.map(_(pc)).distinct.sorted.toSeq).toMap
          if (per.values.exists(_.size > MaxPartSummaryValues)) None
          else Some(per)
        }
      }
    ManifestRef(rel, entries.count(_.status == "add"),
      entries.count(_.status == "remove"), summary)
  }

  def schema: StructType = latestSnapshot match {
    case Some(s) => DataType.fromJson(s.schemaJson).asInstanceOf[StructType]
    case None => throw new IllegalStateException(s"no such table: $location")
  }

  /** Schema as of a snapshot id — the schema that snapshot was committed
    * under (Iceberg semantics: historical reads use historical schemas,
    * so a column added later does not appear, null-filled, in time-travel
    * or incremental results). */
  def schemaAt(asOf: Option[Long]): StructType = asOf match {
    case None => schema
    case Some(id) =>
      snapshots.takeWhile(_.snapshotId <= id).lastOption match {
        case Some(s) => DataType.fromJson(s.schemaJson).asInstanceOf[StructType]
        // below expired history: the read is empty anyway (liveFiles is
        // empty there) — latest schema keeps that contract intact
        case None => schema
      }
  }

  def partitionCols: Seq[String] =
    latestSnapshot.map(_.partitionCols).getOrElse(Seq.empty)

  /** Parsed partition spec ([[PartitionTransforms]]): identity columns
    * and/or hidden-partitioning transforms (days/bucket/truncate). */
  def partitionFields: Seq[PartitionField] =
    partitionCols.map(PartitionTransforms.parse)

  /** True when partitioning uses transforms: source columns stay in the
    * data files and the derived values exist only in the dir layout. */
  def hasHiddenPartitions: Boolean = partitionFields.exists(!_.isIdentity)

  /** Table properties (set at create, carried forward by every commit). */
  def properties: Map[String, String] =
    latestSnapshot.flatMap(_.properties).getOrElse(Map.empty)

  /** Columns declared for Bloom-bitset collection on write
    * (`graft.bloom.columns`) — the one stat needing a value-level scan. */
  private def bloomColumns: Set[String] =
    properties.get("graft.bloom.columns")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)

  /** Iceberg `.history`-shaped metadata view
    * (made_current_at, snapshot_id, parent_id, is_current_ancestor). */
  def history: DataFrame = {
    import spark.implicits._
    snapshots.map(s => (new java.sql.Timestamp(s.timestampMs), s.snapshotId,
        s.parentId, true, s.operation))
      .toDF("made_current_at", "snapshot_id", "parent_id",
        "is_current_ancestor", "operation")
  }

  /** Iceberg `.snapshots`-shaped metadata view: one row per snapshot with
    * its operation and add/remove summary. Counts come from the slim
    * manifest ref — this view never parses a manifest. */
  def metaSnapshots: DataFrame = {
    import spark.implicits._
    snapshots.map(s => (s.snapshotId, s.parentId,
        new java.sql.Timestamp(s.timestampMs), s.operation,
        s.manifest.map(_.addedCount).getOrElse(s.addedFiles.size).toLong,
        s.manifest.map(_.removedCount).getOrElse(s.removedFiles.size).toLong,
        s.addedDeleteFiles.map(_.size.toLong).getOrElse(0L)))
      .toDF("snapshot_id", "parent_id", "committed_at", "operation",
        "added_files", "removed_files", "added_delete_files")
  }

  /** Iceberg `.files`-shaped metadata view over the LIVE file set:
    * partition values, size, add-sequence, and per-column bounds from the
    * snapshot log — the scan-planning facts, queryable as data. */
  def metaFiles: DataFrame = {
    import spark.implicits._
    val live = liveFiles()
    val stats = statsFor(live)
    val seqs = fileAddSeqs(None)
    val sizes = bytesFor(live)
    live.map { f =>
      val len = sizes.getOrElse(f,
        fs.getFileStatus(new Path(tablePath, f)).getLen)
      val cs = stats.getOrElse(f, Map.empty)
      (f, partitionValues(f), len, seqs.getOrElse(f, -1L),
        cs.map { case (c, s) => (c, s.min.orNull) },
        cs.map { case (c, s) => (c, s.max.orNull) })
    }.toDF("file_path", "partition", "size_bytes", "add_sequence",
      "lower_bounds", "upper_bounds")
  }

  /** Iceberg `.delete_files`-shaped metadata view: the LIVE tombstone
    * set — path, applying sequence, encoding (equality|position),
    * equality key columns, recorded bytes. The audit an operator runs
    * before sizing a fold/compaction (morRead plan cost is a function of
    * exactly this list). */
  def metaDeletes: DataFrame = {
    import spark.implicits._
    liveDeletes().map { d =>
      (d.path, d.seq,
        if (d.isPosition) "position" else "equality",
        d.cols.getOrElse(Seq.empty), d.bytes.getOrElse(-1L))
    }.toDF("file_path", "sequence", "content", "equality_cols", "bytes")
  }

  /** Iceberg `.partitions`-shaped metadata view: per-partition file/
    * row/byte rollup over the LIVE set, straight from manifest metadata
    * (no data file is ever opened) — the small-file and skew audit an
    * operator runs before choosing compaction targets. */
  def metaPartitions: DataFrame = {
    import spark.implicits._
    val live = liveFiles()
    val rows = rowsFor(live)
    val sizes = bytesFor(live)
    live.groupBy(partitionValues)
      .map { case (kv, fs_) =>
        (kv, fs_.size.toLong,
          fs_.flatMap(rows.get).sum, fs_.flatMap(sizes.get).sum)
      }.toSeq
      .toDF("partition", "file_count", "row_count", "total_bytes")
  }

  /** Live data files (relative paths) as of `asOf` (default: latest). */
  def liveFiles(asOf: Option[Long] = None): Seq[String] = {
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    replayChain(asOf).foreach { s =>
      val es = entriesOf(s)
      es.foreach(e => if (e.status == "remove") live -= e.path)
      es.foreach(e => if (e.status == "add") live += e.path)
    }
    live.toSeq
  }

  /** Partition-filtered live-file resolution with MANIFEST SKIPPING: a
    * snapshot whose manifest summary proves no entry (add or remove) lies
    * in a kept partition contributes nothing to the filtered set, so its
    * manifest is never parsed — planning cost is O(matching manifests),
    * not O(every file ever committed): the Iceberg manifest-list
    * partition-summary behavior. Skipping is safe for removes because a
    * remove of a pruned-out file removes nothing from this set. */
  def liveFilesWhere(keep: Map[String, Set[String]],
      asOf: Option[Long] = None): Seq[String] = {
    val parts = partitionFields.map(_.physName) // dir-level column names
    def fileMatches(f: String): Boolean = {
      val kv = partitionValues(f)
      parts.forall(p =>
        keep.get(p).forall(vals => kv.get(p).forall(vals.contains)))
    }
    def mayMatch(s: Snapshot): Boolean = s.manifest match {
      case Some(ref) => ref.partitionValues match {
        case Some(pv) => keep.forall { case (c, vals) =>
          pv.get(c).forall(_.exists(vals.contains)) }
        case None => true // summary too wide → must read
      }
      case None => true // legacy inline snapshot
    }
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    replayChain(asOf).foreach { s =>
      if (mayMatch(s)) {
        val es = entriesOf(s)
        es.foreach(e => if (e.status == "remove") live -= e.path)
        es.foreach(e =>
          if (e.status == "add" && fileMatches(e.path)) live += e.path)
      }
    }
    live.toSeq
  }

  private def chainTo(asOf: Option[Long]): Seq[Snapshot] = asOf match {
    case Some(id) => snapshots.takeWhile(_.snapshotId <= id)
    case None => snapshots
  }

  /** The chain suffix state replay actually needs: from the LAST
    * base-state snapshot (create / expire baseline / rewrite-manifests —
    * its manifest carries the full live state) at or before `asOf`.
    * This is what keeps metadata resolution O(manifests since the last
    * rewrite) on long-lived tables instead of O(all history). */
  private def replayChain(asOf: Option[Long]): Seq[Snapshot] = {
    val chain = chainTo(asOf)
    val start = chain.lastIndexWhere(_.base.contains(true))
    if (start <= 0) chain else chain.drop(start)
  }

  /** Live MOR delete files (with their apply-before sequence) as of
    * `asOf`. Empty for pure-COW tables — the overwhelmingly common case,
    * so readers pay nothing unless tombstones actually exist. */
  def liveDeletes(asOf: Option[Long] = None): Seq[DeleteFile] = {
    val live = scala.collection.mutable.LinkedHashMap.empty[String, DeleteFile]
    replayChain(asOf).foreach { s =>
      s.removedDeleteFiles.foreach(_.foreach(live.remove))
      s.addedDeleteFiles.foreach(_.foreach(d => live(d.path) = d))
    }
    live.values.toSeq
  }

  /** Do any live tombstones (as of `asOf`) apply to any of `files`?
    * Used by the graft data source to refuse scans it cannot answer
    * correctly (a bare file scan cannot apply equality deletes). */
  def hasApplicableDeletes(files: Seq[String],
      asOf: Option[Long] = None): Boolean = {
    val deletes = liveDeletes(asOf)
    deletes.nonEmpty && {
      val addSeq = fileAddSeqs(asOf)
      val maxSeq = deletes.map(_.seq).max
      files.exists(f => addSeq.getOrElse(f, Long.MaxValue) < maxSeq)
    }
  }

  /** Add-sequence of every data file seen in the chain: the id of the
    * snapshot that FIRST added it (`fileSeqs` override wins — the expire
    * baseline records original sequences there). First-add, not last-add,
    * so a rollback that re-adds files keeps tombstones applicable to
    * them. Public: the Iceberg exporter emits these as the per-file data
    * sequence numbers that scope equality-delete applicability. */
  def fileAddSeqs(asOf: Option[Long]): Map[String, Long] = {
    val seqs = scala.collection.mutable.Map.empty[String, Long]
    replayChain(asOf).foreach { s =>
      entriesOf(s).foreach { e =>
        if (e.status == "add" && !seqs.contains(e.path))
          seqs(e.path) = e.seq.getOrElse(s.snapshotId)
      }
    }
    seqs.toMap
  }

  // ---- commit protocol ----

  /** Atomically publish `tmp` at `dest`, failing (false) if `dest`
    * already exists — delegated to the pluggable [[CommitLock]]
    * ([[LinkCommitLock]] by default: POSIX link for file://, rename for
    * HDFS; [[LockServiceCommitLock]] documents the S3A-shaped story). */
  private[table] def publishExclusive(tmp: Path, dest: Path): Boolean =
    GraftTable.commitLock.publish(fs, tmp, dest)

  /** Publish a snapshot: write JSON to a temp name, atomically link/rename
    * it into its final slot ([[publishExclusive]] — single-winner even on
    * LocalFileSystem). A publish collision means a concurrent commit won:
    *   - append commits retry against the new tip (appends commute);
    *   - non-append commits (overwrite/merge/compact/rollback) computed
    *     their added/removed lists against the old tip, which may no longer
    *     cover the winner's files — retrying would corrupt the table, so
    *     they fail with a conflict (Iceberg's validation semantics).
    * `schemaFor` is evaluated against the CURRENT tip on every attempt, so
    * a retrying append re-merges its schema against whatever the winner
    * committed instead of republishing a stale JSON. */
  private[table] def commit(operation: String, added: Seq[String],
      removed: Seq[String], schemaFor: Option[Snapshot] => String,
      parts: Seq[String], expectedParent: Option[Long] = None,
      stats: Map[String, Map[String, ColStat]] = Map.empty,
      rows: Map[String, Long] = Map.empty,
      // MOR delete-file changes ((path, bytes) pairs); added deletes get
      // seq = the committed snapshot's id (they apply to strictly older
      // data files) and carry the commit's equality-key columns
      addDeletePaths: Seq[(String, Long)] = Seq.empty,
      addDeleteCols: Option[Seq[String]] = None,
      addDeleteContent: Option[String] = None,
      // files this commit's content REFERENCES without adding/removing
      // (position-tombstone targets): re-validated live at the tip on
      // every publish attempt — Iceberg's validateDataFilesExist. A
      // concurrent rewrite (compact/fold/COW) that retired one makes the
      // commit conflict instead of publishing tombstones that name dead
      // files (which would silently drop the deletes: positions are
      // physical facts about exact files, unlike equality keys, which
      // re-apply to rewritten files through their newer sequence).
      requireLiveFiles: Seq[String] = Seq.empty,
      removeDeletes: Seq[String] = Seq.empty,
      reAddDeletes: Seq[DeleteFile] = Seq.empty,
      txn: Option[(String, Long)] = None,
      props: Option[Map[String, String]] = None,
      bytes: Map[String, Long] = Map.empty,
      seqs: Map[String, Long] = Map.empty,
      base: Boolean = false): Long = {
    // the per-file payload is written ONCE as a manifest before the
    // publish loop (its content does not depend on the snapshot id);
    // retries republish only the slim snapshot record
    val entries =
      removed.map(f => ManifestEntry(f, "remove")) ++
        added.map(f => ManifestEntry(f, "add",
          stats = stats.get(f).filter(_.nonEmpty), rows = rows.get(f),
          seq = seqs.get(f), bytes = bytes.get(f)))
    val manifestRef = graft.util.Phase.timed("table.commit.manifest")(
      if (entries.isEmpty) None else Some(writeManifest(entries, parts)))
    var attempts = 0
    while (true) {
      attempts += 1
      if (attempts > 20) throw new IllegalStateException(
        s"commit contention on $location")
      // Idempotent-writer re-check against the FRESHLY READ chain on every
      // attempt: two concurrent replays of the same (appId, batchId) — the
      // zombie-driver race this Delta-style txn stamp exists to close — can
      // both pass a one-shot pre-staging check; only a check inside the
      // publish-retry loop (after the losing attempt re-reads the tip the
      // winner published) guarantees the batch commits at most once. The
      // loser's staged files are left unreferenced and swept by
      // removeOrphanFiles, same as a crashed write.
      //
      // ORDER MATTERS: the parent must be read BEFORE the stamp check.
      // With the check first, a winner publishing in the gap between the
      // check (no stamp yet) and the parent read (now sees the winner's
      // tip) hands the loser a parent ABOVE the winner — its publish
      // lands on a fresh slot and the batch commits twice (reproduced as
      // a rare ConcurrencySpec flake). Parent-first is safe by cases: a
      // winner publishing before the check is SEEN by it (the fresh
      // listing is a superset of the chain at parent-read time); one
      // publishing after collides on the parent+1 slot and this attempt
      // retries.
      val parent = latestSnapshot
      txn.foreach { case (appId, batchId) =>
        if (lastTxnBatch(appId).exists(_ >= batchId))
          return latestSnapshotId.get
      }
      expectedParent.foreach { exp =>
        // NoParentSentinel asserts a PARENTLESS publish (the caller read
        // an empty chain): without it, two cold-start CAS writers both
        // passing `expectedParent = None` would skip the check entirely —
        // the publish-slot loser would retry on top of the winner and
        // the check-then-append invariant would silently break
        val ok =
          if (exp == GraftTable.NoParentSentinel) parent.isEmpty
          else parent.map(_.snapshotId).contains(exp)
        if (!ok)
          throw new java.util.ConcurrentModificationException(
            s"commit conflict on $location: expected parent " +
              s"${if (exp == GraftTable.NoParentSentinel) "<none>" else exp}, " +
              s"found ${parent.map(_.snapshotId).orNull} — recompute the " +
              s"$operation against the current snapshot and retry")
      }
      if (requireLiveFiles.nonEmpty) {
        val live = liveFiles(parent.map(_.snapshotId)).toSet
        val gone = requireLiveFiles.filterNot(live.contains)
        if (gone.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"commit conflict on $location: $operation references " +
              s"file(s) a concurrent rewrite retired — " +
              s"${gone.take(3).mkString(", ")}; recompute against the " +
              "current snapshot and retry")
      }
      val id = parent.map(_.snapshotId + 1).getOrElse(0L)
      val addedDeletes =
        addDeletePaths.map { case (p, b) =>
          DeleteFile(p, id, Some(b), addDeleteCols,
            addDeleteContent) } ++ reAddDeletes
      val snap = Snapshot(id, parent.map(_.snapshotId),
        System.currentTimeMillis(), operation, Seq.empty, Seq.empty,
        schemaFor(parent), parts,
        addedDeleteFiles =
          if (addedDeletes.isEmpty) None else Some(addedDeletes),
        removedDeleteFiles =
          if (removeDeletes.isEmpty) None else Some(removeDeletes),
        txnAppId = txn.map(_._1), txnBatchId = txn.map(_._2),
        properties = props.orElse(parent.flatMap(_.properties)),
        base = if (base || parent.isEmpty) Some(true) else None,
        manifest = manifestRef)
      val tmp = new Path(metaPath, s".tmp-${UUID.randomUUID()}.json")
      val out = fs.create(tmp, false)
      try out.write(Snapshot.toJson(snap).getBytes("UTF-8")) finally out.close()
      if (publishExclusive(tmp, new Path(metaPath, snapFileName(id)))) {
        // the snapshot is durably published at this point — a failed CDC
        // materialization must not make the commit look failed (a retrying
        // writer would double-append); readers fall back to reconstruction
        // when the _changes file is absent
        try maybeMaterializeChanges(snap) catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"graft: CDC materialization for snapshot $id failed " +
              s"(readers will reconstruct): $e")
        }
        return id
      }
      fs.delete(tmp, false) // lost the race; loop re-reads the new tip
    }
    -1L
  }

  // ---- writers ----

  /** K2/C5: create an empty table from a declared schema (the reference's
    * Avro-schema silver create, /root/reference/bronze-silver.py:168-204). */
  def create(schema: StructType, parts: Seq[String] = Seq.empty,
      properties: Map[String, String] = Map.empty): GraftTable = {
    require(branchName.isEmpty, "create must run on the main table")
    require(!exists, s"table already exists: $location")
    val fields = parts.map(PartitionTransforms.parse)
    fields.foreach(f => require(schema.fieldNames.contains(f.source),
      s"partition source column ${f.source} not in schema"))
    // transform/type compatibility fails HERE, not at first pruned read
    // (hours(dateCol) would otherwise write zone-dependent dirs no read
    // can prune through)
    fields.foreach(f =>
      PartitionTransforms.validateSourceType(f, schema(f.source).dataType))
    require(fields.forall(_.isIdentity) || fields.forall(!_.isIdentity),
      "mixing identity and transform partition fields is not supported — " +
        "wrap identity columns in truncate/bucket or keep the spec uniform")
    fs.mkdirs(metaPath)
    // stable field ids from birth: writes stamp them into parquet
    // footers, reads resolve by id, RENAME becomes a metadata commit
    val withIds = FieldIds.assign(schema)
    commit("create", Seq.empty, Seq.empty, _ => withIds.json, parts,
      props = if (properties.isEmpty) None else Some(properties))
    this
  }

  /** Iceberg-style explicit schema evolution (the SQL
    * `ALTER TABLE ... ADD COLUMNS` path): append nullable columns to the
    * schema via a zero-file "evolve" commit — no data rewritten, old
    * files null-fill on read, time travel keeps the historical schema.
    * New columns MUST be nullable (existing rows cannot satisfy NOT
    * NULL). Re-adding a name that any historical schema carried is
    * refused: graft maps columns by NAME (Iceberg hides re-adds behind
    * field-ids), so old file bytes would silently resurrect under the
    * re-added column. The schema merge re-evaluates against the fresh
    * tip on every publish attempt, so evolve commutes with concurrent
    * appends. */
  def addColumns(cols: Seq[StructField]): Long = {
    require(exists, s"no such table: $location")
    require(cols.nonEmpty, "no columns to add")
    cols.foreach(c => require(c.nullable,
      s"new column ${c.name} must be nullable — existing rows null-fill"))
    val historical = snapshots.flatMap(s =>
      DataType.fromJson(s.schemaJson).asInstanceOf[StructType].fieldNames)
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    commit("evolve", Seq.empty, Seq.empty, parent => {
      val cur =
        DataType.fromJson(parent.get.schemaJson).asInstanceOf[StructType]
      cols.foreach { c =>
        require(!cur.fieldNames.exists(_.equalsIgnoreCase(c.name)),
          s"column already exists: ${c.name}")
        require(
          !historical.contains(c.name.toLowerCase(java.util.Locale.ROOT)),
          s"column ${c.name} existed in an earlier schema of $location " +
            "and was dropped; re-adding it by name would resurrect old " +
            "file data — use a new name (graft is name-mapped, not " +
            "field-id-mapped)")
      }
      extendWithIds(cur, cols).json
    }, partitionCols)
  }

  /** Append `extra` to `cur` with fresh field ids above anything the
    * log EVER used — a dropped column's id is never reused (its bytes
    * live on in old files; reuse would resurrect them under the new
    * column via id-resolution). Legacy un-id'd schemas extend plain. */
  private def extendWithIds(cur: StructType,
      extra: Seq[StructField]): StructType =
    if (!FieldIds.hasIds(cur) || extra.isEmpty)
      StructType(cur.fields ++ extra)
    else {
      val used = math.max(FieldIds.maxId(Seq(cur)),
        FieldIds.maxId(snapshots.map(s =>
          DataType.fromJson(s.schemaJson).asInstanceOf[StructType])))
      StructType(cur.fields ++ FieldIds.extend(extra, used))
    }

  /** Drop columns via a zero-file "evolve" commit. Data files keep the
    * bytes; the column leaves the schema, so reads project it away and
    * time travel still sees it under its historical schema. Refused for
    * partition source columns and while merge-on-read delete files are
    * live (tombstones anti-join by their key columns — `compact()` to
    * apply them first). */
  def dropColumns(names: Seq[String], ifExists: Boolean = false): Long = {
    require(exists, s"no such table: $location")
    require(names.nonEmpty, "no columns to drop")
    val sources = partitionFields.map(_.source.toLowerCase).toSet
    names.foreach(n => require(!sources.contains(n.toLowerCase),
      s"cannot drop partition source column $n"))
    require(liveDeletes().isEmpty,
      s"cannot drop columns while merge-on-read delete files are live " +
        s"on $location — compact() to apply tombstones first")
    commit("evolve", Seq.empty, Seq.empty, parent => {
      val cur =
        DataType.fromJson(parent.get.schemaJson).asInstanceOf[StructType]
      val missing = names.filterNot(n =>
        cur.fieldNames.exists(_.equalsIgnoreCase(n)))
      if (!ifExists) require(missing.isEmpty,
        s"no such column(s): ${missing.mkString(", ")}")
      val keep = cur.fields.filterNot(f =>
        names.exists(_.equalsIgnoreCase(f.name)))
      require(keep.nonEmpty, "cannot drop every column")
      StructType(keep).json
    }, partitionCols)
  }

  /** RENAME COLUMN via a zero-file "evolve" commit — legal only on
    * tables born with field ids ([[FieldIds]]): every file's columns
    * resolve by parquet field id at read ([[readFiles]] flips
    * `spark.sql.parquet.fieldId.read.enabled` for id-carrying schemas),
    * so files written under the old name keep their column — no silent
    * null-fill, no rewrite; stats/Bloom pruning follows through the
    * id-based key remap in [[statsFor]], and time travel sees the old
    * name under historical schemas (same field id underneath). Refused
    * for legacy name-mapped tables (retrofitting ids to existing files
    * would need a rewrite to be safe), for partition source columns
    * (partition metadata keys by name), and while live MOR tombstones
    * key on the column. A bloom-columns table property naming the
    * column is remapped in the same commit. */
  def renameColumn(oldName: String, newName: String): Long = {
    require(exists, s"no such table: $location")
    val cur = schema
    require(cur.fieldNames.exists(_.equalsIgnoreCase(oldName)),
      s"no such column: $oldName")
    require(FieldIds.hasIds(cur),
      s"RENAME COLUMN requires a table created with field ids — " +
        s"$location is name-mapped, so a rename would silently null the " +
        "column in existing files; CALL graft.retrofit_field_ids to " +
        "rewrite it with ids first (or ADD a new column and backfill)")
    require(!cur.fieldNames.exists(_.equalsIgnoreCase(newName)),
      s"column already exists: $newName")
    val historical = snapshots.flatMap(s =>
      DataType.fromJson(s.schemaJson).asInstanceOf[StructType].fieldNames)
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    require(!historical.contains(newName.toLowerCase(java.util.Locale.ROOT)),
      s"column $newName existed in an earlier schema of $location — " +
        "renaming onto a historical name invites ambiguity in stats and " +
        "tooling; use a fresh name")
    require(!partitionFields.exists(_.source.equalsIgnoreCase(oldName)),
      s"cannot rename partition source column $oldName")
    // d.cols = None (legacy tombstone, keys unknown) must also refuse
    require(!liveDeletes().exists(_.cols.forall(_.exists(
      _.equalsIgnoreCase(oldName)))),
      s"cannot rename $oldName while live merge-on-read tombstones may " +
        "key on it — compact() to fold them first")
    val newProps = properties.get("graft.bloom.columns")
      .filter(_.split(",").map(_.trim).exists(_.equalsIgnoreCase(oldName)))
      .map { v =>
        properties.updated("graft.bloom.columns",
          v.split(",").map(_.trim).filter(_.nonEmpty)
            .map(c => if (c.equalsIgnoreCase(oldName)) newName else c)
            .mkString(","))
      }
    commit("evolve", Seq.empty, Seq.empty, parent => {
      val p = DataType.fromJson(parent.get.schemaJson)
        .asInstanceOf[StructType]
      require(p.fieldNames.exists(_.equalsIgnoreCase(oldName)),
        s"column $oldName was dropped concurrently")
      require(!p.fieldNames.exists(_.equalsIgnoreCase(newName)),
        s"column $newName was added concurrently")
      StructType(p.fields.map(f =>
        if (f.name.equalsIgnoreCase(oldName)) f.copy(name = newName)
        else f)).json
    }, partitionCols, props = newProps)
  }

  /** Widen a column's type in place (Iceberg type promotion) via a
    * zero-file "evolve" commit — Spark 4's parquet reader upcasts the
    * old files natively. Restricted to INTEGER widenings
    * (byte/short/int → short/int/long) and DECIMAL precision increases:
    * exactly the shapes whose recorded min/max stat strings re-parse
    * EXACTLY under the new type, so file pruning stays correct on old
    * files. float→double is refused (a float's shortest-repr stat
    * string does not round-trip through double — range pruning could
    * wrongly skip files). Refused while any live file carries a Bloom
    * bitset for the column (value hashes are type-dependent;
    * `compact()` rebuilds stats under the new type first). */
  def widenColumn(name: String, newType: DataType): Long = {
    require(exists, s"no such table: $location")
    val cur = schema
    val field = cur.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(s"no such column: $name"))
    import org.apache.spark.sql.types._
    val intRank = Map[DataType, Int](ByteType -> 1, ShortType -> 2,
      IntegerType -> 3, LongType -> 4)
    val isFloatToDouble =
      field.dataType == FloatType && newType == DoubleType
    val ok = isFloatToDouble || ((field.dataType, newType) match {
      case (a, b) if intRank.contains(a) && intRank.contains(b) =>
        intRank(a) < intRank(b)
      case (a: DecimalType, b: DecimalType) =>
        a.scale == b.scale && a.precision < b.precision
      case _ => false
    })
    require(ok, s"cannot widen ${field.dataType.simpleString} to " +
      s"${newType.simpleString}: supported widenings are byte/short/int " +
      "to a wider integer, float to double, and decimal(p,s) to " +
      "decimal(p+,s)")
    // float partition dirs would need the same exact re-rendering in the
    // partition-path parser; partitioning on float is refused at write
    // time anyway, but guard the evolve side independently
    require(!partitionFields.exists(_.source.equalsIgnoreCase(name)),
      s"cannot widen partition source column $name")
    val live = liveFiles()
    val bloomed = statsFor(live).exists(_._2.get(field.name)
      .exists(_.bloom.isDefined))
    // float→double: stats of float-era files (min/max AND blooms) are
    // handled at resolution time — statsFor re-renders the bounds through
    // the exact float→double conversion and drops the (type-dependent)
    // blooms for those files, so pruning stays sound with no rewrite.
    // Integer/decimal widenings round-trip their stat strings untouched
    // but have no sound bloom story — they still require a compact first.
    require(isFloatToDouble || !bloomed,
      s"cannot widen $name while live files carry Bloom bitsets for it " +
        "(value hashes are type-dependent) — compact() first")
    commit("evolve", Seq.empty, Seq.empty, parent => {
      val p = DataType.fromJson(parent.get.schemaJson)
        .asInstanceOf[StructType]
      StructType(p.fields.map(f =>
        if (f.name.equalsIgnoreCase(name)) f.copy(dataType = newType)
        else f)).json
    }, partitionCols)
  }

  /** Commit updated table properties through the snapshot log (the SQL
    * `ALTER TABLE ... SET TBLPROPERTIES` path) — carried forward by
    * every later commit, same as create-time properties. */
  def setProperties(kvs: Map[String, String]): Long = {
    require(exists, s"no such table: $location")
    commit("set-properties", Seq.empty, Seq.empty,
      parent => parent.get.schemaJson, partitionCols,
      props = Some(properties ++ kvs))
  }

  /** Remove table properties via a "set-properties" commit. */
  def unsetProperties(keys: Seq[String]): Long = {
    require(exists, s"no such table: $location")
    commit("set-properties", Seq.empty, Seq.empty,
      parent => parent.get.schemaJson, partitionCols,
      props = Some(properties -- keys))
  }

  /** Tag a snapshot with a stable name (the Iceberg tag-ref shape).
    * Stored as a versioned table property (`graft.ref.<name>` — one
    * zero-file commit, atomic, time-travelable itself), resolved by
    * [[readTag]] and SQL `VERSION AS OF '<name>'`;
    * [[expireSnapshots]] retains every tagged snapshot. */
  def tag(name: String, snapshotId: Option[Long] = None): Long = {
    require(name.matches("[A-Za-z][A-Za-z0-9_.-]*"),
      s"invalid tag name: $name (must start with a letter)")
    val id = snapshotId.getOrElse(latestSnapshotId.getOrElse(
      throw new IllegalStateException(s"no such table: $location")))
    require(snapshots.exists(_.snapshotId == id),
      s"no snapshot $id in $location")
    setProperties(Map(s"graft.ref.$name" -> id.toString))
  }

  def dropTag(name: String): Long =
    unsetProperties(Seq(s"graft.ref.$name"))

  /** Named snapshot refs (tag → snapshot id). Non-numeric `graft.ref.*`
    * values (settable through raw SET TBLPROPERTIES) are ignored rather
    * than poisoning every tag read and expire with a parse error. */
  def refs: Map[String, Long] = properties.collect {
    case (k, v) if k.startsWith("graft.ref.") &&
        GraftTable.isSnapshotIdString(v) =>
      k.stripPrefix("graft.ref.") -> v.toLong
  }

  def readTag(name: String): DataFrame =
    readAsOf(refs.getOrElse(name,
      throw new IllegalArgumentException(s"no tag '$name' on $location")))

  // ---- named branches (Iceberg branch refs: write-audit-publish) ----
  //
  // A branch is a named line of commits forked from a main snapshot:
  // commits on it publish `snap-NNNNNNNN-<branch>.json` slots (invisible
  // to main's listing), its chain replays main up to the fork point then
  // its own commits, and `fastForward` publishes the branch's commits
  // into the main slots one atomic create-exclusive at a time — possible
  // only while main's tip is still the fork point, so the publish either
  // lands the branch history verbatim or fails with a conflict. The
  // marker file (`_graft/branch-<name>.json`, create-exclusive) records
  // the fork point and makes branch creation single-winner.

  private def branchMarkerPath(name: String): Path =
    new Path(metaPath, s"branch-$name.json")

  /** Fork point recorded for branch `name` (throws if no such branch). */
  private[table] def branchBase(name: String): Long = {
    val p = branchMarkerPath(name)
    require(fs.exists(p), s"no branch '$name' on $location")
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(bytes)
      new String(bytes, "UTF-8").trim.toLong
    } finally in.close()
  }

  /** Create branch `name` at `at` (default: current main tip). The
    * marker create is exclusive — two racing creates get one branch. */
  def createBranch(name: String, at: Option[Long] = None): Long = {
    require(branchName.isEmpty, "createBranch must run on the main table")
    require(name.matches("[A-Za-z][A-Za-z0-9_.-]*"),
      s"invalid branch name: $name (must start with a letter)")
    require(!refs.contains(name),
      s"a tag named '$name' already exists on $location — branches and " +
        "tags share the VERSION AS OF namespace")
    val base = at.getOrElse(latestSnapshotId.getOrElse(
      throw new IllegalStateException(s"no such table: $location")))
    require(snapshots.exists(_.snapshotId == base),
      s"no snapshot $base in $location")
    val p = branchMarkerPath(name)
    val out = try fs.create(p, false) catch {
      case _: java.io.IOException => throw new IllegalStateException(
        s"branch '$name' already exists on $location")
    }
    try out.write(base.toString.getBytes("UTF-8")) finally out.close()
    base
  }

  /** Live branches (name → fork-point snapshot id). */
  def branches: Map[String, Long] = {
    if (!exists) return Map.empty
    fs.listStatus(metaPath).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("branch-") && n.endsWith(".json"))
      .map(n => n.stripPrefix("branch-").stripSuffix(".json"))
      .map(n => n -> branchBase(n)).toMap
  }

  /** A writer/reader view of branch `name`: same table location, but the
    * snapshot chain is main-up-to-fork + the branch's own commits, and
    * new commits publish into branch slots. The full read/write API
    * (append, merge, delete, evolve, incremental, MOR) works unchanged;
    * table-maintenance ops (expire, orphan sweep) are main-only. */
  def branch(name: String): GraftTable = {
    require(branchName.isEmpty, s"already on branch ${branchName.get}")
    branchBase(name) // existence check
    new GraftTable(spark, location, Some(name))
  }

  def readBranch(name: String): DataFrame = branch(name).read()

  /** Branch commits awaiting publish (ascending). */
  private def branchOnlySnapshots(name: String): Seq[Snapshot] =
    snapshotsMatching(
      s"snap-\\d{8}-${java.util.regex.Pattern.quote(name)}\\.json")

  /** Abandon branch `name`: delete its commits, their manifests (unless a
    * crash-interrupted fastForward already published them to main), and
    * the marker. Staged data files become unreferenced and age out via
    * [[removeOrphanFiles]] — exactly like a discarded pending write. */
  def dropBranch(name: String): Unit = {
    require(branchName.isEmpty, "dropBranch must run on the main table")
    val bs = branchOnlySnapshots(name)
    val mainManifests = snapshots.flatMap(_.manifest).map(_.path).toSet
    bs.foreach { s =>
      s.manifest.map(_.path).filterNot(mainManifests.contains)
        .foreach(m => fs.delete(new Path(tablePath, m), false))
      fs.delete(new Path(metaPath, f"snap-${s.snapshotId}%08d-$name.json"),
        false)
    }
    fs.delete(branchMarkerPath(name), false)
  }

  /** Publish branch `name`'s commits onto main — the Iceberg
    * fast-forward. Requires main's tip to still be the branch's fork
    * point (else the branch diverged: ConcurrentModificationException).
    * Each branch snapshot is published into its main slot by the same
    * create-exclusive primitive commits use, in chain order, so a racing
    * main commit loses or wins a slot atomically — never a torn chain: a
    * crash mid-publish leaves a valid main prefix of the branch, and
    * re-running fastForward resumes idempotently (a slot already holding
    * the identical snapshot is skipped). Returns the new main tip. */
  def fastForward(name: String): Long = {
    require(branchName.isEmpty, "fastForward must run on the main table")
    val bs = branchOnlySnapshots(name)
    val base = branchBase(name)
    if (bs.isEmpty) { // nothing staged: just drop the ref
      fs.delete(branchMarkerPath(name), false)
      return latestSnapshotId.getOrElse(base)
    }
    bs.foreach { s =>
      val destName = f"snap-${s.snapshotId}%08d.json"
      val dest = new Path(metaPath, destName)
      def sameAlready: Boolean = fs.exists(dest) && {
        val in = fs.open(dest)
        val existing = try {
          val bytes = new Array[Byte](fs.getFileStatus(dest).getLen.toInt)
          in.readFully(bytes)
          Snapshot.fromJson(new String(bytes, "UTF-8"))
        } finally in.close()
        existing == s // resumed fastForward republishing its own prefix
      }
      if (!sameAlready) {
        val tmp = new Path(metaPath, s".tmp-${UUID.randomUUID()}.json")
        val out = fs.create(tmp, false)
        try out.write(Snapshot.toJson(s).getBytes("UTF-8"))
        finally out.close()
        if (!publishExclusive(tmp, dest)) {
          fs.delete(tmp, false)
          if (!sameAlready) throw new java.util.ConcurrentModificationException(
            s"fastForward conflict on $location: main advanced past " +
              s"fork point $base of branch '$name' — rebase the branch " +
              "(dropBranch + re-create from the new tip) and retry")
        }
      }
    }
    // fully absorbed: branch slots and marker go away; manifests are now
    // referenced by the main chain, so only the slot files are deleted
    bs.foreach(s => fs.delete(
      new Path(metaPath, f"snap-${s.snapshotId}%08d-$name.json"), false))
    fs.delete(branchMarkerPath(name), false)
    bs.last.snapshotId
  }

  /** Iceberg-style partition spec evolution: later writes lay out files
    * under `parts`; existing files stay in their old layout, and every
    * pruning site treats a file missing the current spec's dir
    * components conservatively (kept — pruned only by its column stats).
    * Restricted to TRANSFORM (days/months/bucket/truncate) or empty
    * specs on both sides — and across the whole snapshot chain — because
    * identity partitioning removes the source column's bytes from the
    * data files (Spark writer semantics), so identity-written files
    * cannot be read under any other spec. Re-parameterized transforms
    * are safe: the parameter is part of the dir name (`c_bucket8` vs
    * `c_bucket16`), so a new spec never misreads old dirs. */
  def updatePartitionSpec(parts: Seq[String]): Long = {
    require(exists, s"no such table: $location")
    val fields = parts.map(PartitionTransforms.parse)
    fields.foreach(f => require(schema.fieldNames.contains(f.source),
      s"partition source column ${f.source} not in schema"))
    fields.foreach(f =>
      PartitionTransforms.validateSourceType(f, schema(f.source).dataType))
    require(fields.forall(!_.isIdentity),
      "partition spec evolution supports transform fields (days/months/" +
        "bucket/truncate) or an empty spec only: identity-partitioned " +
        "files do not carry the partition column's bytes, so they could " +
        "not be read under the evolved spec")
    val identityInChain = snapshots.exists(s =>
      s.partitionCols.exists(p => PartitionTransforms.parse(p).isIdentity))
    require(!identityInChain,
      s"cannot evolve the partition spec of $location: its history " +
        "contains identity-partitioned snapshots (those files do not " +
        "carry the partition column's bytes)")
    commit("set-spec", Seq.empty, Seq.empty,
      parent => parent.get.schemaJson, parts)
  }

  /** Stage `df` as parquet files and return their table-relative paths
    * with on-disk sizes (captured during the move walk — zero extra
    * RPCs). Partition layout is produced by the standard Spark writer;
    * files are then moved (renamed, no copy) into the table tree.
    *
    * With table property `graft.write.distribution = hash` (Iceberg's
    * write.distribution-mode), the batch is repartitioned by the
    * partition expressions first, so each partition value is written by
    * exactly ONE task — without it, every task writes a file into every
    * partition dir it touches, and a 1000-executor append into a
    * 100-partition table bursts into up to 100k small files. Skipped
    * when the caller explicitly range-clustered the batch (`clustered`):
    * sort-on-write already pins the layout, and a hash shuffle on top
    * would destroy the disjoint value ranges it bought. */
  private def stageAndMove(df: DataFrame,
      parts: Seq[String], clustered: Boolean = false): Seq[(String, Long)] = {
    val stage = new Path(metaPath, s"stage-${UUID.randomUUID()}")
    // hidden partitioning: derive the transform columns for the writer's
    // dir layout; the source columns stay in the data files
    val fields = parts.map(PartitionTransforms.parse)
    val (toWrite, physNames) =
      if (!fields.exists(!_.isIdentity)) (df, parts)
      else (fields.filterNot(_.isIdentity).foldLeft(df)((acc, f) =>
        acc.withColumn(f.physName, PartitionTransforms.columnFor(
          f, col(f.source), df.schema(f.source).dataType))),
        fields.map(_.physName))
    // REBALANCE rather than plain repartition: same tuple→one-task
    // routing, but AQE also coalesces small outputs and SPLITS a
    // genuinely skewed partition value instead of pinning it to a
    // single writer (the same runtime shape the foreign write-back
    // path uses — IcebergWriteBack.newDataManifest)
    val distributed =
      if (!clustered && physNames.nonEmpty &&
          properties.getOrElse("graft.write.distribution", "none") == "hash")
        toWrite.hint("rebalance", physNames.map(col): _*)
      else toWrite
    // pin MICROS timestamps for the staged write: INT96 (the legacy
    // default some sessions carry) records no usable footer statistics,
    // which would silently disable timestamp stats and their pruning.
    // When the caller's session already pins MICROS (the harness mains
    // do), the frame is written as-is — no session clone, no re-analysis
    // of the staged plan. Otherwise the pin lives on a CLONED session
    // (shared context/cache, private conf) so concurrent commits in the
    // caller's session can never interleave with a set/restore of shared
    // conf.
    val bound =
      if (spark.conf.get("spark.sql.parquet.outputTimestampType", "INT96")
          == "TIMESTAMP_MICROS") distributed
      else {
        val writeSpark = graft.util.Phase.timed("table.stage.cloneSession")(
          org.apache.spark.sql.graftglue.GraftSqlGlue.cloneSession(spark))
        writeSpark.conf.set("spark.sql.parquet.outputTimestampType",
          "TIMESTAMP_MICROS")
        org.apache.spark.sql.graftglue.GraftSqlGlue
          .ofRows(writeSpark, distributed.queryExecution.logical)
      }
    val writer = bound.write.mode("overwrite")
      .option("compression", "snappy")
      // the stage dir is private to this writer and the real commit is
      // the snapshot-json publish AFTER the move below, so v1's two-phase
      // job-commit (driver-side rename ladder over every task dir) buys
      // no atomicity here — v2 renames task output once at task commit.
      // _SUCCESS markers are likewise never consulted by the move walk.
      // (guide §6: per-file fixed costs dominate small commits)
      .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    graft.util.Phase.timed("table.stage.write") {
      (if (physNames.nonEmpty) writer.partitionBy(physNames: _*) else writer)
        .parquet(stage.toString)
    }
    val files = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    graft.util.Phase.timed("table.stage.move") {
      if (fs.getScheme == "file") {
        // local fs: walk and rename through java.nio — Hadoop's
        // LocalFileSystem pays checksum/LocatedFileStatus bookkeeping per
        // file (~10ms each, measured) that a staged move does not need
        import scala.jdk.CollectionConverters._
        val stageDir = java.nio.file.Paths.get(stage.toUri.getPath)
        val tableDir = java.nio.file.Paths.get(tablePath.toUri.getPath)
        val walk = java.nio.file.Files.walk(stageDir)
        try walk.iterator().asScala.foreach { p =>
          if (p.getFileName.toString.endsWith(".parquet")) {
            val rel = stageDir.relativize(p).toString
            val dest = tableDir.resolve(rel)
            java.nio.file.Files.createDirectories(dest.getParent)
            // same-volume move = atomic rename; a pre-existing dest
            // throws FileAlreadyExistsException, matching the rename
            // guard below
            java.nio.file.Files.move(p, dest)
            files += ((rel, java.nio.file.Files.size(dest)))
          }
        } finally walk.close()
        deleteLocalRecursively(stageDir.toFile)
      } else {
        val it = fs.listFiles(stage, true)
        while (it.hasNext) {
          val f = it.next()
          val name = f.getPath.getName
          if (name.endsWith(".parquet")) {
            val rel = stripPrefix(f.getPath.toString, stage.toString)
            val dest = new Path(tablePath, rel)
            fs.mkdirs(dest.getParent)
            if (!fs.rename(f.getPath, dest))
              throw new IllegalStateException(s"failed to move $rel into $location")
            files += ((rel, f.getLen))
          }
        }
        fs.delete(stage, true)
      }
    }
    files.toSeq
  }

  private def deleteLocalRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).foreach(_.foreach(deleteLocalRecursively))
    f.delete()
  }

  private def stripPrefix(full: String, prefix: String): String = {
    val i = full.indexOf(prefix)
    full.substring(i + prefix.length).dropWhile(_ == '/')
  }

  /** Table-relative path of a scan-reported absolute path (the
    * `input_file_name()` form: a URI string, possibly percent-encoded).
    * BASENAMES ARE NOT UNIQUE across partition dirs — Spark's dynamic
    * partition writer gives one task's files in different partition dirs
    * identical `part-NNNNN-<jobUUID>` names — so anything attributing a
    * scan row to a table file must key by this full relative path. */
  private def relOfScanPath(full: String): String = {
    val decoded =
      try new java.net.URI(full).getPath
      catch { case _: java.net.URISyntaxException => full }
    val anchor = tablePath.toUri.getPath
    val i = decoded.indexOf(anchor)
    val p = if (i >= 0) decoded.substring(i + anchor.length) else decoded
    p.dropWhile(_ == '/')
  }

  /** Per-file column min/max + row counts for newly written files — the
    * Iceberg manifest-stats equivalent, recorded in the committing
    * manifest and used by merge and the graft data source to skip files
    * whose range cannot match (file-level pruning below partition
    * granularity).
    *
    * Bounds and row counts come from PARQUET FOOTERS ([[FooterStats]]) —
    * the writer already recorded them, so a commit costs one footer read
    * per new file, NOT a second scan of the data it just wrote. Bloom
    * membership bitsets are the one stat that needs a value-level pass;
    * they are collected only for columns declared in the
    * `graft.bloom.columns` table property, as one distributed aggregate
    * over only the new files. */
  private def collectStats(relFiles: Seq[String])
      : (Map[String, Map[String, ColStat]], Map[String, Long]) = {
    if (relFiles.isEmpty) return (Map.empty, Map.empty)
    // only IDENTITY partition sources leave the data files; transform
    // sources stay in them and their stats drive file pruning
    val absent = partitionFields.filter(_.isIdentity).map(_.source)
    // stat-typed LEAVES: top-level scalars plus struct leaves under
    // their dotted path (the parquet column-chunk name, so the footer
    // pass needs no mapping) — nested-leaf bounds prune scans and
    // export as Iceberg leaf-id stats
    val statFields = FileStats.leafStatFields(schema, absent.toSet)

    // footer pass: driver-side, metadata-only; parallel across files
    // because a commit can carry hundreds and each read is a small
    // independent IO
    val conf = spark.sessionState.newHadoopConf()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(16, relFiles.size)))
    val footer: Map[String, (Map[String, ColStat], Long)] =
      try graft.util.Phase.timed("table.stats.footer") {
        import scala.jdk.CollectionConverters._
        val tasks = relFiles.map { rel =>
          new java.util.concurrent.Callable[(String, (Map[String, ColStat], Long))] {
            def call() = rel -> FooterStats.read(conf,
              new Path(tablePath, rel), statFields)
          }
        }
        pool.invokeAll(tasks.asJava).asScala.map(_.get()).toMap
      } finally pool.shutdown()

    val bloomFields = statFields.filter(f => bloomColumns.contains(f.name))
    val blooms: Map[String, Map[String, String]] =
      if (bloomFields.isEmpty) Map.empty
      else graft.util.Phase.timed("table.stats.bloom") {
        GraftTable.statsDataScans.incrementAndGet()
        // files resolved by full table-relative path ([[relOfScanPath]]):
        // a staged write is exactly where cross-partition basename
        // collisions happen (one task, several partition dirs), and a
        // misattributed Bloom bitset would let the merge point probe
        // prune a file that DOES contain a key — silent key duplication
        val relSet = relFiles.toSet
        val df = spark.read
          .schema(StructType(bloomFields.toIndexedSeq))
          .parquet(relFiles.map(f => s"$location/$f"): _*)
        val aggs = bloomFields.map(f => graft.functions.AggExpressions
          .bloom_agg(xxhash64(col(f.name))).as(s"bf_${f.name}")).toIndexedSeq
        df.groupBy(input_file_name().as("__f"))
          .agg(aggs.head, aggs.tail: _*).collect().toSeq
          .flatMap { r =>
            val rel = relOfScanPath(r.getString(0))
            if (!relSet.contains(rel)) None
            else Some(rel -> bloomFields.flatMap { f =>
              Option(r.getAs[scala.collection.Seq[Long]](s"bf_${f.name}"))
                .map(b => f.name -> FileStats.encodeBloom(b.toArray))
            }.toMap)
          }.toMap
      }

    val stats = relFiles.flatMap { rel =>
      val bounds = footer.get(rel).map(_._1).getOrElse(Map.empty)
      val bf = blooms.getOrElse(rel, Map.empty)
      val merged = (bounds.keySet ++ bf.keySet).map { c =>
        val b = bounds.getOrElse(c, ColStat(None, None))
        c -> b.copy(bloom = bf.get(c))
      }.toMap
      if (merged.isEmpty) None else Some(rel -> merged)
    }.toMap
    (stats, footer.map { case (rel, (_, n)) => rel -> n })
  }

  /** Row counts for `files`, resolved across the snapshot chain (same
    * travel rules as [[statsFor]]). Missing entries mean "unknown". */
  def rowsFor(files: Seq[String], asOf: Option[Long] = None)
      : Map[String, Long] = {
    val want = files.toSet
    val out = scala.collection.mutable.Map.empty[String, Long]
    replayChain(asOf).foreach(s => entriesOf(s).foreach { e =>
      if (e.status == "add" && want.contains(e.path))
        e.rows.foreach(out(e.path) = _)
    })
    out.toMap
  }

  /** On-disk sizes for `files` from the manifest entries — planning and
    * the COW/MOR sizing decision read these, not one getFileStatus RPC
    * per file. Missing entries mean "unknown" (pre-size manifests). */
  def bytesFor(files: Seq[String], asOf: Option[Long] = None)
      : Map[String, Long] = {
    val want = files.toSet
    val out = scala.collection.mutable.Map.empty[String, Long]
    replayChain(asOf).foreach(s => entriesOf(s).foreach { e =>
      if (e.status == "add" && want.contains(e.path))
        e.bytes.foreach(out(e.path) = _)
    })
    out.toMap
  }

  /** Stats for `files`, resolved across the whole snapshot chain (stats
    * travel with the snapshot that ADDED a file; rollback re-adds files
    * without recomputing them). Missing entries mean "no info".
    *
    * Keys are remapped to the `asOf` schema's names through field ids:
    * stats are recorded under the column names current WHEN THE FILE WAS
    * WRITTEN, so after a RENAME the pruning sites (which look up by
    * today's name) would otherwise miss them — losing, not corrupting,
    * pruning. The remap is built per adding-snapshot and is empty (zero
    * cost) for never-renamed tables. A stat whose write-time name maps
    * to no current id keeps its key: conservative, never mis-prunes. */
  def statsFor(files: Seq[String], asOf: Option[Long] = None)
      : Map[String, Map[String, ColStat]] = {
    val want = files.toSet
    val out = scala.collection.mutable.Map.empty[String, Map[String, ColStat]]
    val curSchema = schemaAt(asOf)
    val curById = FieldIds.byId(curSchema)
    val curTypeByName: Map[String, DataType] =
      curSchema.fields.map(f => f.name -> f.dataType).toMap
    val renameCache =
      scala.collection.mutable.Map.empty[Long, Map[String, String]]
    def renamesOf(s: Snapshot): Map[String, String] =
      renameCache.getOrElseUpdate(s.snapshotId, {
        if (curById.isEmpty) Map.empty
        else DataType.fromJson(s.schemaJson).asInstanceOf[StructType]
          .fields.flatMap(f => FieldIds.idOf(f).flatMap(curById.get)
            .filter(_ != f.name).map(f.name -> _)).toMap
      })
    // float→double promotion: the stat STRING was rendered from the
    // float value by the era's Cast ("0.1"), and parsing it back as
    // DOUBLE lands on a different real than the exact float bound
    // (0.1f = 0.100000001490...d) — an unsound bound in either
    // direction. The conversion itself is exact, so bounds stay sound
    // by RE-RENDERING at resolution time: parse with the RECORDING
    // era's type, widen exactly, render as the current type. Same
    // replay-time mapping discipline as renames above; integer-rank and
    // decimal(p→p+) widenings round-trip their strings untouched.
    val retypeCache =
      scala.collection.mutable.Map.empty[Long, Map[String, DataType]]
    def retypesOf(s: Snapshot): Map[String, DataType] =
      retypeCache.getOrElseUpdate(s.snapshotId, {
        DataType.fromJson(s.schemaJson).asInstanceOf[StructType]
          .fields.flatMap { f =>
            val curName = FieldIds.idOf(f).flatMap(curById.get)
              .getOrElse(f.name)
            (f.dataType, curTypeByName.get(curName)) match {
              case (org.apache.spark.sql.types.FloatType,
                  Some(org.apache.spark.sql.types.DoubleType)) =>
                Some(f.name -> f.dataType)
              case _ => None
            }
          }.toMap
      })
    def rerender(v: Option[String], from: DataType): Option[String] =
      v.flatMap(s => Option(org.apache.spark.sql.graftglue.GraftSqlGlue
        .castFromString(s, from)).map {
          case f: java.lang.Float => f.toDouble.toString
          case other => other.toString
        })
    replayChain(asOf).foreach(s => entriesOf(s).foreach { e =>
      if (e.status == "add" && want.contains(e.path))
        e.stats.filter(_.nonEmpty).foreach { st =>
          val rn = renamesOf(s)
          val rt = retypesOf(s)
          out(e.path) =
            if (rn.isEmpty && rt.isEmpty) st
            else st.map { case (k, v0) =>
              val v = rt.get(k) match {
                case Some(from) => ColStat(
                  rerender(v0.min, from), rerender(v0.max, from),
                  bloom = None, // value hashes are type-dependent
                  nulls = v0.nulls) // null counts are not
                case None => v0
              }
              // dotted (struct-leaf) keys remap their TOP segment: a
              // rename of the struct column carries its leaves' stats
              // (graft renames are top-level-only, so the tail is
              // stable)
              val mapped = {
                val i = k.indexOf('.')
                if (i < 0) rn.getOrElse(k, k)
                else rn.get(k.take(i)).map(_ + k.substring(i))
                  .getOrElse(k)
              }
              mapped -> v
            }
        }
    })
    out.toMap
  }

  /** Align df to the table schema (column order + types), as Iceberg's
    * writer does by-name resolution. Missing NULLABLE columns always
    * null-fill (Iceberg's optional-column write semantics — essential
    * once a concurrent evolve can add a column between a writer's plan
    * and its commit retry; a misnamed source column is still caught by
    * append's no-extra-columns check). Missing non-nullable columns are
    * only fillable via explicit `fillMissing`. */
  private def align(df: DataFrame, schema: StructType,
      fillMissing: Boolean = false): DataFrame = {
    val hardMissing = schema.fields
      .filterNot(f => df.columns.contains(f.name)).filterNot(_.nullable)
    require(fillMissing || hardMissing.isEmpty,
      s"source is missing non-nullable columns: " +
        hardMissing.map(_.name).mkString(","))
    // .as(name, metadata): the table schema's field-id metadata rides on
    // the write frame, so the parquet writer stamps parquet.field.id
    // into every footer (spark.sql.parquet.fieldId.write.enabled, on by
    // default) — what makes RENAME a pure metadata operation later
    df.select(schema.fields.map { f =>
      if (df.columns.contains(f.name)) {
        // sameType ignores nullability: parquet hands arrays/maps back
        // with NULLABLE containers, and casting those to a declared
        // containsNull=false element type is an invalid cast — every
        // rewrite (compact/merge/delete) of such a table would fail
        // analysis. Same-type columns alias without a cast (also
        // cheaper); genuine type changes cast to the container-widened
        // target for the same reason.
        val cur = df.schema(f.name).dataType
        val same = GraftTable.widenContainers(cur) ==
          GraftTable.widenContainers(f.dataType)
        if (same) col(f.name).as(f.name, f.metadata)
        else col(f.name).cast(GraftTable.widenContainers(f.dataType))
          .as(f.name, f.metadata)
      }
      else lit(null).cast(f.dataType).as(f.name, f.metadata)
    }.toIndexedSeq: _*)
  }

  /** K1 append: add files, remove nothing. Creates the table on first write
    * (the reference's exists→append / else→create branch,
    * /root/reference/raw-bronze.py:178-183).
    *
    * @param mergeSchema Iceberg-style schema evolution: new columns in `df`
    *   are added to the table schema as nullable (older files read them as
    *   null); columns missing from `df` are null-filled. Off by default —
    *   appends then require an exact column set. */
  /** @param sortBy cluster-on-write: range-repartition + sort the batch
    *   on these columns before writing, so files carry DISJOINT value
    *   ranges. This is what makes the snapshot log's min/max stats
    *   selective — unclustered writes give every file ~the full value
    *   range and stats prune nothing; clustered writes let a point/range
    *   filter (or a merge key probe) skip all but the overlapping files.
    *   The Iceberg write.sort-order analogue. File count follows AQE's
    *   byte-size targeting unless `sortFiles` pins it. */
  def append(df: DataFrame, parts: Seq[String] = Seq.empty,
      mergeSchema: Boolean = false,
      txn: Option[(String, Long)] = None,
      sortBy: Seq[String] = Seq.empty,
      sortFiles: Option[Int] = None,
      // optimistic-concurrency guard: the append only publishes if the
      // table tip is still this snapshot (ConcurrentModificationException
      // otherwise) — for check-then-append callers (e.g. corpus dedup)
      // whose decision to append depends on the state they read
      expectedParent: Option[Long] = None): Long = {
    if (!exists) {
      create(df.schema, parts)
    }
    // idempotent writer: if this (appId, batchId) already committed, the
    // append is a replay — return the existing snapshot without staging
    txn.foreach { case (appId, batchId) =>
      if (lastTxnBatch(appId).exists(_ >= batchId))
        return latestSnapshotId.get
    }
    val targetSchema =
      if (!mergeSchema) {
        val extras = df.columns.filterNot(schema.fieldNames.contains)
        require(extras.isEmpty, // silent column drop would lose data
          s"source has columns not in the table schema: ${extras.mkString(",")}" +
            " — append with mergeSchema=true to evolve the schema")
        schema
      } else {
        val cur = schema
        val newCols = df.schema.fields
          .filterNot(f => cur.fieldNames.contains(f.name))
          .map(_.copy(nullable = true))
        if (newCols.isEmpty) cur
        else {
          // RESERVE the new columns' field ids via a metadata-only evolve
          // commit BEFORE staging any file: the single-winner snapshot
          // publish serializes allocation, so two concurrent mergeSchema
          // appends can never stage different columns under the same id
          // (ids are in the staged parquet footers — a post-hoc clash
          // would make id-resolution read the wrong bytes). schemaFor
          // re-merges against the fresh tip on every publish retry, so
          // the loser re-derives its ids above the winner's. If the data
          // write later fails, the columns stay — nullable and empty,
          // exactly as ADD COLUMNS followed by a failed append.
          commit("evolve", Seq.empty, Seq.empty, {
            case Some(p) =>
              val tip =
                DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
              val missing = newCols
                .filterNot(f => tip.fieldNames.contains(f.name))
              extendWithIds(tip, missing).json
            case None => extendWithIds(cur, newCols).json
          }, partitionCols)
          schema // the tip now carries every new column with its id
        }
      }
    val aligned0 = align(df, targetSchema, fillMissing = mergeSchema)
    val aligned =
      if (sortBy.isEmpty) aligned0
      else (sortFiles match {
        case Some(n) => aligned0.repartitionByRange(n, sortBy.map(col): _*)
        case None => aligned0.repartitionByRange(sortBy.map(col): _*)
      }).sortWithinPartitions(sortBy.map(col): _*)
    val staged = stageAndMove(aligned, partitionCols,
      clustered = sortBy.nonEmpty)
    val added = staged.map(_._1)
    // schema is re-merged against the tip on every commit attempt: if a
    // concurrent append(mergeSchema=true) added a column while we staged,
    // republishing the precomputed targetSchema would silently drop it
    // from all subsequent reads even though the winner's files carry it.
    val sr = collectStats(added)
    commit("append", added, Seq.empty, {
      case Some(p) =>
        val cur = DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
        val extra = targetSchema.fields
          .filterNot(f => cur.fieldNames.contains(f.name))
          .map(_.copy(nullable = true))
        // the staged files already carry these field ids in their
        // footers; a concurrent evolve claiming one of them for a
        // DIFFERENT column would make id-resolution read the wrong
        // bytes — fail loud, the append can be retried cleanly
        extra.flatMap(f => FieldIds.idOf(f).map(f.name -> _)).foreach {
          case (n, id) =>
            val clash = FieldIds.byId(cur).get(id).filterNot(_ == n)
            require(clash.isEmpty, s"field id $id staged for new column " +
              s"$n was claimed concurrently by column ${clash.orNull} — " +
              "retry the append")
        }
        StructType(cur.fields ++ extra).json
      case None => targetSchema.json
    }, partitionCols, stats = sr._1, rows = sr._2, txn = txn,
      bytes = staged.toMap, expectedParent = expectedParent)
  }

  // ---- write-audit-publish (Iceberg's WAP pattern, branch-free) ----

  /** Stage a batch's files into the table tree WITHOUT committing:
    * invisible to every reader (no snapshot references them), swept by
    * [[removeOrphanFiles]] if abandoned past its age gate. Audit the
    * staged rows via [[readPending]], then [[publishPending]] — a
    * normal append commit, idempotent under replay — or
    * [[discardPending]]. The token is a persisted marker, so audit and
    * publish can happen from a different session (or after a driver
    * restart). Stats are collected at stage time; publish is pure
    * metadata. */
  def stagePending(df: DataFrame): String = {
    require(exists, s"no such table: $location")
    val extras = df.columns.filterNot(schema.fieldNames.contains)
    require(extras.isEmpty,
      s"source has columns not in the table schema: ${extras.mkString(",")}")
    val staged = stageAndMove(align(df, schema), partitionCols)
    val added = staged.map(_._1)
    val sr = collectStats(added)
    val bytes = staged.toMap
    val entries = added.map(f => ManifestEntry(f, "add",
      stats = sr._1.get(f).filter(_.nonEmpty), rows = sr._2.get(f),
      bytes = bytes.get(f)))
    val ref = writeManifest(entries, partitionCols)
    val token = UUID.randomUUID().toString
    val p = new Path(metaPath, s"pending-$token.json")
    val out = fs.create(p, false)
    try out.write(ref.path.getBytes("UTF-8")) finally out.close()
    token
  }

  private def pendingEntries(token: String): (String, Seq[ManifestEntry]) = {
    val p = new Path(metaPath, s"pending-$token.json")
    require(fs.exists(p), s"no pending write $token on $location")
    val in = fs.open(p)
    val rel = try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(bytes); new String(bytes, "UTF-8")
    } finally in.close()
    (rel, readManifest(rel).entries)
  }

  /** The staged (uncommitted) rows of a pending write — the audit
    * step. */
  def readPending(token: String): DataFrame =
    readFiles(pendingEntries(token)._2.map(_.path))

  /** Commit a pending write as an append. Idempotent: the commit
    * carries a txn stamp keyed by the token, so a crash-replayed
    * publish commits at most once. */
  def publishPending(token: String): Long = {
    val (rel, entries) = pendingEntries(token)
    val files = entries.map(_.path)
    val id = commit("append", files, Seq.empty,
      parent => parent.get.schemaJson, partitionCols,
      stats = entries.flatMap(e => e.stats.map(e.path -> _)).toMap,
      rows = entries.flatMap(e => e.rows.map(e.path -> _)).toMap,
      bytes = entries.flatMap(e => e.bytes.map(e.path -> _)).toMap,
      txn = Some((s"graft-wap-$token", 0L)))
    fs.delete(new Path(metaPath, s"pending-$token.json"), false)
    fs.delete(new Path(tablePath, rel), false) // commit wrote its own
    id
  }

  /** Drop a pending write: delete its staged files and marker. */
  def discardPending(token: String): Unit = {
    val (rel, entries) = pendingEntries(token)
    entries.foreach(e => fs.delete(new Path(tablePath, e.path), false))
    fs.delete(new Path(tablePath, rel), false)
    fs.delete(new Path(metaPath, s"pending-$token.json"), false)
  }

  /** Highest batch id committed by idempotent writer `appId` (the
    * streaming sink's replay check). */
  def lastTxnBatch(appId: String): Option[Long] = {
    val ids = snapshots.flatMap(s =>
      s.txnBatchId.filter(_ => s.txnAppId.contains(appId)).toSeq ++
        s.txnStamps.flatMap(_.get(appId)).toSeq)
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** K1 overwrite: replace the full live file set (tombstones included —
    * the new state has no history for them to apply to). `txn` makes the
    * overwrite idempotent like [[append]]'s stamp (a replayed full-state
    * batch — e.g. TableFeed's rewrite recovery — commits at most once). */
  def overwrite(df: DataFrame, parts: Seq[String] = Seq.empty,
      txn: Option[(String, Long)] = None): Long = {
    if (!exists) return append(df, parts, txn = txn)
    txn.foreach { case (appId, batchId) =>
      if (lastTxnBatch(appId).exists(_ >= batchId))
        return latestSnapshotId.get
    }
    val parentAtRead = latestSnapshotId
    // extras are refused like append's check: with align null-filling
    // missing nullable columns, a TYPO'D column name would otherwise
    // silently null-wipe the real column across the whole table
    val extras = df.columns.filterNot(schema.fieldNames.contains)
    require(extras.isEmpty,
      s"source has columns not in the table schema: ${extras.mkString(",")}")
    val aligned = align(df, schema)
    val removed = liveFiles()
    val staged = stageAndMove(aligned, partitionCols)
    val added = staged.map(_._1)
    val sr = collectStats(added)
    commit("overwrite", added, removed, _ => schema.json, partitionCols,
      expectedParent = parentAtRead, stats = sr._1, rows = sr._2,
      removeDeletes = liveDeletes().map(_.path), txn = txn,
      bytes = staged.toMap)
  }

  // ---- readers ----

  private def readFiles(files: Seq[String],
      asOf: Option[Long] = None): DataFrame = {
    val sch = schemaAt(asOf)
    // id-based column resolution (SPARK-38094): active only when the
    // requested schema carries parquet.field.id metadata — i.e. tables
    // created with field ids — so files written under a pre-rename name
    // still resolve their columns; name-mapped legacy tables and plain
    // parquet reads in the same session are untouched (their schemas
    // carry no ids, and the conf is inert without them)
    if (FieldIds.hasIds(sch))
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    if (files.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], sch)
    } else if (hasHiddenPartitions || partitionFields.isEmpty) {
      // hidden partitions: dir columns must never leak into the schema.
      // Empty spec: no partition values are needed from dirs at all, and
      // skipping basePath also keeps a spec-evolved table readable (its
      // old transform-layout dirs + new flat files would otherwise trip
      // partition discovery's conflicting-structure check).
      // the data files carry every logical column; reading the leaf files
      // WITHOUT basePath suppresses partition discovery, so the derived
      // dir columns never leak into the result schema
      spark.read
        .schema(sch)
        .parquet(files.map(f => s"$location/$f"): _*)
    } else {
      spark.read
        .schema(sch)
        .option("basePath", location)
        .parquet(files.map(f => s"$location/$f"): _*)
    }
  }

  /** MOR-aware scan: apply live equality-delete tombstones to `files`.
    * Data files are grouped by which deletes apply (a delete at seq D
    * covers files first-added strictly before D, so the applicable set is
    * a suffix of the deletes sorted by seq — at most |deletes|+1 groups);
    * each group runs ONE anti-join against the union of its applicable
    * tombstone files (not one join per delete file — the plan is
    * O(groups), and [[foldDeletes]] bounds the group count). The
    * tombstone side is broadcast only while its manifest-recorded bytes
    * fit the session's autoBroadcastJoinThreshold; a larger tombstone set
    * (a forced-MOR bulk delete) falls back to a shuffle anti-join instead
    * of shipping an arbitrarily large key set to every executor.
    * Pure-COW tables take the plain scan path with zero overhead.
    *
    * `keepPos` retains the scan-position bridge columns
    * ([[GraftTable.UriCol]]/[[GraftTable.PosCol]]) in the result — the
    * changelog's position-delete pre-image needs them. */
  private def morRead(files: Seq[String], asOf: Option[Long],
      keepPos: Boolean = false): DataFrame = {
    def withMeta(df: DataFrame): DataFrame = df.select(col("*"),
      col("_metadata.file_path").as(GraftTable.UriCol),
      col("_metadata.row_index").as(GraftTable.PosCol))
    def plain(): DataFrame = {
      val r = readFiles(files, asOf)
      if (keepPos && files.nonEmpty) withMeta(r) else r
    }
    val deletes = liveDeletes(asOf).sortBy(_.seq)
    if (deletes.isEmpty) return plain()
    val addSeq = fileAddSeqs(asOf)
    val groups = files.groupBy(f =>
      deletes.filter(_.seq > addSeq.getOrElse(f, Long.MaxValue)))
    if (groups.isEmpty) return plain()
    val broadcastMax =
      try spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        .stripSuffix("b").stripSuffix("B").toLowerCase match {
          case s if s.endsWith("k") => s.dropRight(1).toLong * 1024
          case s if s.endsWith("m") => s.dropRight(1).toLong * 1024 * 1024
          case s if s.endsWith("g") =>
            s.dropRight(1).toLong * 1024 * 1024 * 1024
          case s => s.toLong
        }
      catch { case _: NumberFormatException => 10L * 1024 * 1024 }
    def delBytes(d: DeleteFile): Long = d.bytes.getOrElse(
      fs.getFileStatus(new Path(tablePath, d.path)).getLen)
    // legacy tombstones (no recorded key columns) resolve them from the
    // file's own footer — bounded work, foldDeletes caps live tombstones
    def delCols(d: DeleteFile): Seq[String] = d.cols.getOrElse(
      spark.read.parquet(s"$location/${d.path}").columns.toSeq)
    val UriCol = GraftTable.UriCol
    val PosCol = GraftTable.PosCol
    groups.map { case (applicable, groupFiles) =>
      val (posDels, eqDels) = applicable.partition(_.isPosition)
      // position deletes match on (scan URI, row ordinal): the scan
      // carries both as parquet metadata columns — surfaced only when a
      // position tombstone actually applies (or the caller asked), so
      // the common equality-only plan is untouched
      val needMeta = keepPos || posDels.nonEmpty
      val df =
        if (!needMeta) readFiles(groupFiles, asOf)
        else withMeta(readFiles(groupFiles, asOf))
      // one anti-join per distinct equality-key column set (merges on the
      // same keys — the overwhelmingly common case — collapse to one)
      val afterEq = eqDels.groupBy(delCols).foldLeft(df) {
        case (acc, (cols, dels)) =>
          val keys = spark.read.parquet(
            dels.map(d => s"$location/${d.path}"): _*).select(
            cols.map(col): _*)
          val small = broadcastMax > 0 &&
            dels.map(delBytes).sum <= broadcastMax
          acc.join(if (small) broadcast(keys) else keys, cols, "left_anti")
      }
      val out =
        if (posDels.isEmpty) afterEq
        else {
          // tombstone rows name table-relative paths; bridge to scan URIs
          // via a driver-built lookup over THIS group's files (positions
          // for files outside the group drop out in the inner join — they
          // cannot match here anyway). One anti-join for ALL position
          // tombstones of the group: (file, pos) pairs are disjoint facts.
          val keys = spark.read.parquet(
            posDels.map(d => s"$location/${d.path}"): _*)
            .select(col("file_path"), col("pos"))
          val lookup = spark.createDataFrame(
            groupFiles.map(f => (f, scanUriOf(f)))).toDF("file_path", UriCol)
          val posKeys = keys.join(broadcast(lookup), Seq("file_path"))
            .select(col(UriCol), col("pos").as(PosCol))
          val small = broadcastMax > 0 &&
            posDels.map(delBytes).sum <= broadcastMax
          afterEq.join(if (small) broadcast(posKeys) else posKeys,
            Seq(UriCol, PosCol), "left_anti")
        }
      if (needMeta && !keepPos) out.drop(UriCol, PosCol) else out
    }.reduce(_ unionByName _)
  }

  /** S5: full scan of the latest snapshot. */
  def read(): DataFrame = morRead(liveFiles(), None)

  /** Time travel: scan as of a snapshot id, under that snapshot's schema. */
  def readAsOf(snapshotId: Long): DataFrame =
    morRead(liveFiles(Some(snapshotId)), asOf = Some(snapshotId))

  /** S6: incremental append scan — exactly the rows added by snapshots in
    * `(startExclusive, endInclusive]`, reading only those files. Mirrors
    * Iceberg's start/end-snapshot-id read
    * (/root/reference/bronze-silver.py:146-149) including its restriction
    * to append snapshots. */
  def readIncremental(startExclusive: Long, endInclusive: Long): DataFrame =
    readIncremental(startExclusive, endInclusive, skipRewrites = false)

  /** @param skipRewrites deliver only append/create snapshots' files and
    *   SKIP rewrites in the range instead of refusing (Iceberg's
    *   streaming skip-overwrite semantics — rows arriving via a rewrite,
    *   e.g. a merge's inserts, are not delivered). */
  def readIncremental(startExclusive: Long, endInclusive: Long,
      skipRewrites: Boolean): DataFrame =
    readFiles(incrementalFiles(startExclusive, endInclusive, skipRewrites),
      asOf = Some(endInclusive))

  /** Files added by append snapshots in `(startExclusive, endInclusive]`;
    * refuses ranges crossing rewrites, as Iceberg's incremental scan does
    * (or skips them, see [[readIncremental]]). */
  def incrementalFiles(startExclusive: Long, endInclusive: Long,
      skipRewrites: Boolean = false): Seq[String] = {
    val range = snapshots
      .filter(s => s.snapshotId > startExclusive && s.snapshotId <= endInclusive)
    // zero-file metadata commits (schema/property/spec changes) add and
    // remove nothing — they are safe to cross, not rewrites. A BASE
    // snapshot (expire baseline / rewritten-manifests root) is NEVER an
    // append even when its recorded operation says so: it carries the
    // absorbed history's FULL live state in its manifest, and delivering
    // that as "newly appended" would hand an incremental consumer every
    // pre-existing row — refuse (or skip, under the skip-rewrites
    // semantics) exactly as for any other rewrite-shaped commit.
    val appends = range.filter(s => !s.base.contains(true) &&
      (s.operation match {
        // prune-deletes retires inert tombstone refs, adds and removes no
        // data files — safe to cross, like the other metadata commits
        case "append" | "create" | "evolve" | "set-properties" |
             "set-spec" | "prune-deletes" => true
        case _ => false
      }))
    if (!skipRewrites) {
      val bad = range.diff(appends)
      require(bad.isEmpty,
        s"incremental read over non-append snapshots: ${bad.map(_.snapshotId).mkString(",")}")
    }
    appends.flatMap(addedFilesOf)
  }

  /** CDC changelog read (the Delta change-data-feed / Iceberg
    * changelog-view shape): the net row-level changes committed by each
    * snapshot in `(startExclusive, endInclusive]`, as the end snapshot's
    * data columns plus `_change_type` ('insert' | 'delete') and
    * `_commit_snapshot_id`. An update surfaces as delete + insert in the
    * same commit.
    *
    * Per snapshot:
    *   - pure appends: added files are inserts (no diff read);
    *   - COW rewrites (merge/overwrite/rollback/row-level SQL): inserts =
    *     added-file rows EXCEPT ALL removed-file rows, deletes = the
    *     reverse — rows a rewrite copied untouched cancel out, so only
    *     genuine changes surface;
    *   - MOR merges: added data files are inserts; each tombstone's
    *     deletes are the PARENT state's rows semi-joined on its keys
    *     (tombstones only cover files added before them, which is exactly
    *     the parent-visible state);
    *   - compact / rewrite-manifests / fold are data-equivalent by
    *     construction and skipped without reads (their diff is provably
    *     empty); zero-file metadata commits contribute nothing.
    *
    * Scale shape: only the files a snapshot TOUCHED are read (the
    * MOR-tombstone pre-image reads only the parent files whose min/max +
    * Bloom stats may contain a tombstone key — [[morPreImageFiles]] —
    * once per distinct key set, filtered by a semi-join); the COW diff is
    * a hash EXCEPT ALL over the touched files only — never a
    * table-history product. Rollback commits alone pay an exact two-state
    * diff (see [[changesOf]]). Results under evolved schemas conform to the end schema
    * (missing columns null-fill, dropped columns vanish) so one changelog
    * frame spans evolve commits. */
  def changes(startExclusive: Long, endInclusive: Long): DataFrame = {
    val endSch = schemaAt(Some(endInclusive))
    val conform = conformTo(endSch) _
    def tag(df: DataFrame, kind: String, sid: Long): DataFrame =
      df.withColumn("_change_type", lit(kind))
        .withColumn("_commit_snapshot_id", lit(sid))
    val dataEquivalent =
      Set("compact", "rewrite-manifests", "fold", "retrofit",
        "prune-deletes")
    val range = snapshots
      .filter(s => s.snapshotId > startExclusive && s.snapshotId <= endInclusive)
      .filterNot(s => dataEquivalent(s.operation))
    val parts = range.flatMap { s =>
      // base snapshots carry FULL state, not a change set: a create/CTAS
      // root, or an expire baseline absorbing expired history (whose
      // carried tombstones were applied long ago and whose parent is
      // gone). Emit the NET state as inserts — Delta CDF's
      // initial-snapshot semantics — and nothing else.
      if (s.base.contains(true)) {
        val st = conform(readAsOf(s.snapshotId))
        if (addedFilesOf(s).isEmpty) None
        else Some(tag(st, "insert", s.snapshotId))
      } else materializedChanges(s, conform, tag)
        .map(Seq(_)).getOrElse(changesOf(s, conform, tag))
    }
    parts.reduceOption(_ unionByName _).getOrElse {
      tag(conform(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], endSch)), "", 0L).limit(0)
    }
  }

  /** Per-snapshot change branches for [[changes]] (non-base commits). */
  private def changesOf(s: Snapshot,
      conform: DataFrame => DataFrame,
      tag: (DataFrame, String, Long) => DataFrame): Seq[DataFrame] = {
      // Rollback is the one commit whose net change the per-branch
      // decomposition below cannot express: it may REMOVE tombstones
      // (rows resurrect inside files live in BOTH states — neither an
      // added- nor a removed-file branch sees them) and RE-ADD tombstones
      // whose deletes were already emitted by their original commits.
      // Rollbacks are rare administrative commits, so pay the exact
      // two-state MOR-aware diff once rather than corrupt the stream.
      if (s.operation == "rollback") {
        val parent = s.parentId.getOrElse(
          throw new IllegalStateException("rollback as root snapshot"))
        val now = conform(readAsOf(s.snapshotId))
        val before = conform(readAsOf(parent))
        return Seq(tag(now.exceptAll(before), "insert", s.snapshotId),
          tag(before.exceptAll(now), "delete", s.snapshotId))
      }
      val added = addedFilesOf(s)
      val removed = removedFilesOf(s)
      val tombs = s.addedDeleteFiles.getOrElse(Seq.empty)
      // both sides of the COW diff are read MOR-AWARE at their snapshot:
      // the pre-image (removed files AT THE PARENT) must exclude rows an
      // earlier MOR merge already tombstoned, or a later COW rewrite of
      // the same file re-emits those rows as spurious second deletes
      // (the added side is read at this snapshot for symmetry — fresh
      // files carry the commit's own sequence, so no older tombstone can
      // apply and the plan degenerates to the plain scan).
      val addedDf =
        if (added.isEmpty) None
        else Some(conform(morRead(added, Some(s.snapshotId))))
      val removedDf =
        if (removed.isEmpty) None
        else Some(conform(morRead(removed, s.parentId)))
      val inserts = addedDf.map { a =>
        tag(removedDf.fold(a)(a.exceptAll), "insert", s.snapshotId)
      }
      val cowDeletes = removedDf.map { r =>
        tag(addedDf.fold(r)(r.exceptAll), "delete", s.snapshotId)
      }
      val (posTombs, keyTombs) = tombs.partition(_.isPosition)
      // same-key tombstones of one commit share one pre-image semi-join;
      // the pre-image scan is PRUNED by the parent files' min/max + Bloom
      // stats against the tombstone keys — a changelog range spanning many
      // MOR commits on a clustered table reads O(files containing the
      // keys) per commit, not O(table state) per commit
      val morDeletes = keyTombs.groupBy(d => d.cols.getOrElse(
        spark.read.parquet(s"$location/${d.path}").columns.toSeq))
        .map { case (cols, dels) =>
          val keys = spark.read
            .parquet(dels.map(d => s"$location/${d.path}"): _*)
            .select(cols.map(col): _*)
          val parent = s.parentId.getOrElse(
            throw new IllegalStateException("tombstones on a root snapshot"))
          val pre = morPreImageFiles(parent, cols, keys)
          tag(conform(morRead(pre, Some(parent)))
            .join(broadcastIfSmall(keys, dels), cols, "left_semi"),
            "delete", s.snapshotId)
        }
      // position tombstones name their target files outright — the
      // pre-image is exactly those files (no stats probe needed): rows
      // visible at the parent whose (file, pos) the tombstone lists
      val posDeletes =
        if (posTombs.isEmpty) Seq.empty
        else {
          val parent = s.parentId.getOrElse(
            throw new IllegalStateException("tombstones on a root snapshot"))
          val keys = spark.read
            .parquet(posTombs.map(d => s"$location/${d.path}"): _*)
            .select(col("file_path"), col("pos"))
          val parentLive = liveFiles(Some(parent)).toSet
          val files = keys.select("file_path").distinct().collect()
            .map(_.getString(0)).toSeq.filter(parentLive.contains)
          if (files.isEmpty) Seq.empty
          else {
            val lookup = spark.createDataFrame(
              files.map(f => (f, scanUriOf(f))))
              .toDF("file_path", GraftTable.UriCol)
            val posKeys = keys.join(broadcast(lookup), Seq("file_path"))
              .select(col(GraftTable.UriCol), col("pos").as(GraftTable.PosCol))
            val pre = morRead(files, Some(parent), keepPos = true)
            Seq(tag(conform(pre
              .join(broadcastIfSmall(posKeys, posTombs),
                Seq(GraftTable.UriCol, GraftTable.PosCol), "left_semi")
              .drop(GraftTable.UriCol, GraftTable.PosCol)),
              "delete", s.snapshotId))
          }
        }
      (inserts ++ cowDeletes ++ morDeletes ++ posDeletes).toSeq
  }

  /** Conform `df` to a changelog end-schema: end-schema columns only, in
    * order, null-filling columns the frame predates and casting evolved
    * types — so one changelog frame spans evolve commits. Columns are
    * matched by FIELD ID first (a renamed column is the same column
    * under an older name — name matching would null it), by name for
    * legacy un-id'd schemas. */
  private def conformTo(endSch: StructType)(df: DataFrame): DataFrame = {
    val srcById = df.schema.fields.flatMap(f =>
      FieldIds.idOf(f).map(_ -> f.name)).toMap
    df.select(endSch.fields.map { f =>
      val src = FieldIds.idOf(f).flatMap(srcById.get)
        .orElse(Some(f.name).filter(df.columns.contains))
      (src match {
        case Some(c) =>
          // same nullability discipline as [[align]]: parquet returns
          // arrays/maps with NULLABLE containers, and casting those to a
          // declared containsNull=false element type is an INVALID cast —
          // a changelog read over any array-columned table would fail
          // analysis. Same-type (modulo container nullability) aliases
          // without a cast; genuine evolution casts container-widened.
          val cur = df.schema(c).dataType
          if (GraftTable.widenContainers(cur) ==
              GraftTable.widenContainers(f.dataType)) df(c)
          else df(c).cast(GraftTable.widenContainers(f.dataType))
        case None => lit(null).cast(f.dataType)
      }).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** Write-time CDC materialization (the Delta change-data-feed shape),
    * opt-in via table property `graft.cdc.materialize=true`: after a
    * data-changing commit publishes, its net row changes are computed once
    * (the same [[changesOf]] branches the read path uses — bit-for-bit the
    * reconstruction result) and staged as parquet under `_changes/<id>`,
    * published by atomic rename. Repeated changelog consumers then read
    * O(changed bytes) per commit instead of re-paying the diff; commits
    * without a materialized file (crash between publish and materialize,
    * pre-property history) transparently fall back to reconstruction.
    * The file stores the commit's schema columns + `_change_type`;
    * `_commit_snapshot_id` is re-attached at read (constant per file). */
  private def maybeMaterializeChanges(snap: Snapshot): Unit = {
    // `_changes/<id>` is keyed by MAIN-chain ids: a branch commit's id
    // will collide with a main commit's after unrelated main activity, so
    // branch commits never materialize — branch changelog reads (and main
    // reads after a fastForward) reconstruct, the standard fallback
    if (branchName.isDefined) return
    if (!snap.properties.exists(
      _.get("graft.cdc.materialize").contains("true"))) return
    if (snap.base.contains(true)) return
    val noChange = Set("create", "evolve", "set-properties", "set-spec",
      "compact", "rewrite-manifests", "fold", "retrofit",
      "prune-deletes")
    if (noChange(snap.operation)) return
    val sch = schemaAt(Some(snap.snapshotId))
    def tag(df: DataFrame, kind: String, sid: Long): DataFrame =
      df.withColumn("_change_type", lit(kind))
    val parts = changesOf(snap, conformTo(sch), (df, k, _) => tag(df, k, 0L))
    if (parts.isEmpty) return
    val out = parts.reduce(_ unionByName _)
    val tmp = new Path(tablePath, s"_changes/.tmp-${UUID.randomUUID()}")
    out.write.mode("overwrite")
      // committer v2 as in stageAndMove (private tmp dir published by
      // the rename below) — but _SUCCESS stays: the materialized-read
      // path DISTRUSTS a dir without it (ChangelogSpec pins that a
      // truncated/foreign dir falls back to reconstruction)
      .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
      .parquet(tmp.toString)
    val dst = changesPath(snap.snapshotId)
    fs.mkdirs(dst.getParent)
    // a concurrent materializer of the same commit produced identical
    // content — losing the rename race just discards the duplicate
    if (!fs.rename(tmp, dst)) fs.delete(tmp, true)
  }

  private def changesPath(snapshotId: Long): Path =
    new Path(tablePath, s"_changes/$snapshotId")

  /** Read a commit's materialized change file, when present. */
  private def materializedChanges(s: Snapshot,
      conform: DataFrame => DataFrame,
      tag: (DataFrame, String, Long) => DataFrame): Option[DataFrame] = {
    // on a branch, a main commit's materialized file can share this
    // snapshot id — but only for ids PAST the fork point (the shared
    // prefix below it is the same commit on both chains, so its
    // materialization is equally valid here)
    if (branchName.exists(b => s.snapshotId > branchBase(b))) return None
    val dir = changesPath(s.snapshotId)
    // trust the dir only once its _SUCCESS marker is visible: rename is
    // copy+delete on object stores, so existence alone can expose a
    // partially-copied directory (silently truncated change set); the
    // marker is written inside the staged dir and arrives with the data
    if (!fs.exists(new Path(dir, "_SUCCESS"))) return None
    val raw = spark.read.parquet(dir.toString)
    Some(Seq("insert", "delete").map(k =>
      tag(conform(raw.filter(col("_change_type") === k)
        .drop("_change_type")), k, s.snapshotId))
      .reduce(_ unionByName _))
  }

  /** The parent-state files a tombstone's key set may touch: live files
    * at `parent` whose recorded min/max ranges overlap the keys' range,
    * point-probed per key (min/max gaps + Bloom bitsets) when the key set
    * is small — the same manifest pruning the COW merge planner uses
    * ([[MergeInto.mayContainKeys]]). Files without recorded stats are
    * always kept (pruning must never drop a file it cannot clear). Costs
    * one tiny driver job over the tombstone key files — O(batch), repaid
    * by not scanning the full parent state per changelog commit. */
  private[table] def morPreImageFiles(parent: Long, cols: Seq[String],
      keys: DataFrame): Seq[String] = {
    val live = liveFiles(Some(parent))
    val parentSchema = schemaAt(Some(parent))
    // a key column evolved away since the tombstone committed → nothing
    // to compare stats against; keep every file (correct, just unpruned)
    if (cols.exists(c => !parentSchema.fieldNames.contains(c) ||
        !schema.fieldNames.contains(c))) return live
    val stats = statsFor(live, Some(parent))
    val (keyRange, keyValues) = MergeInto.keyProbe(keys, cols, parentSchema)
    live.filter(f =>
      MergeInto.mayContainKeys(this, f, stats, cols, keyRange, keyValues))
  }

  /** Broadcast tombstone keys under the session broadcast threshold, by
    * manifest-recorded bytes (same policy as [[morRead]]). */
  private def broadcastIfSmall(keys: DataFrame,
      dels: Seq[DeleteFile]): DataFrame = {
    val bytes = dels.map(d => d.bytes.getOrElse(
      fs.getFileStatus(new Path(tablePath, d.path)).getLen)).sum
    if (bytes <= 10L * 1024 * 1024) broadcast(keys) else keys
  }

  /** Partition-pruned scan: resolves the file list driver-side with
    * manifest skipping ([[liveFilesWhere]]), so only matching partitions
    * are ever listed/read AND only matching manifests are ever parsed
    * (`keep` maps partition column -> kept values). */
  def readPruned(keep: Map[String, Set[String]]): DataFrame =
    morRead(liveFilesWhere(keep), None)

  /** Stats-pruned scan for a keyed probe: read only the live files whose
    * recorded column stats (min/max ranges, point-probed per key value +
    * Bloom bitsets when the probe's distinct key set is small) may
    * contain rows matching `probe`'s key tuples — the same manifest
    * pruning the COW merge planner uses ([[MergeInto.mayContainKeys]]).
    * This is FILE-level skipping resolved driver-side; the caller still
    * applies the exact row filter (e.g. a semi-join on `probe`), which
    * now scans O(matching files), not the whole table. Costs one tiny
    * driver job over `probe` (key rows under cap; range + distinct values
    * both derive from it) —
    * checkpoint `probe` first if it is derived from an expensive frame.
    * Files without recorded stats are always kept (never mis-prunes). */
  def readForKeys(probe: DataFrame, cols: Seq[String],
      asOf: Option[Long] = None): DataFrame = {
    val tip = asOf.orElse(latestSnapshotId).getOrElse(return read())
    morRead(morPreImageFiles(tip, cols, probe), asOf)
  }

  /** Parse `k=v` partition-dir components of a relative file path. Values
    * are decoded with Spark's own partition-path unescaper — URL-decoding
    * is NOT equivalent (it would turn a literal '+' into a space, which
    * Spark's escaper leaves untouched, silently corrupting partition
    * matching for such values). */
  def partitionValues(relPath: String): Map[String, String] =
    relPath.split('/').dropRight(1).flatMap { seg =>
      seg.split("=", 2) match {
        case Array(k, v) => Some(k ->
          org.apache.spark.sql.graftglue.GraftSqlGlue.unescapePathName(v))
        case _ => None
      }
    }.toMap

  // ---- maintenance (Iceberg-style table operations) ----

  /** Compaction: rewrite the live file set into at most
    * `filesPerPartition` files per partition (small-file compaction — the
    * Iceberg rewrite_data_files action). Data is unchanged; snapshot op is
    * "compact" so incremental readers refuse to cross it, as Iceberg's
    * incremental scan does for rewrites.
    *
    * @param sortBy optional RE-CLUSTERING during the rewrite (the
    *   OPTIMIZE ... ZORDER/sort shape): accumulated unclustered appends
    *   are range-partitioned + sorted so the rewritten files get tight,
    *   disjoint stat bounds again. Pass a single z-value via
    *   [[graft.operators.ZOrder]] column names for multi-dimension. */
  /** Byte-targeted compaction: pick the output file count from the LIVE
    * set's manifest-recorded total size (Iceberg's
    * target-file-size-bytes), then [[compact]]. No filesystem metadata
    * RPCs — the sizes ride in the manifests. */
  def compactToSize(targetFileBytes: Long = 128L * 1024 * 1024,
      sortBy: Seq[String] = Seq.empty,
      where: Option[Column] = None): Long = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val scoped = where match {
      case Some(c) => filesMatching(liveFiles(), c)
      case None => liveFiles()
    }
    val n = math.max(1L, (bytesOf(scoped) + targetFileBytes - 1)
      / targetFileBytes).toInt
    compact(filesPerPartition = n, sortBy = sortBy, where = where)
  }

  /** @param where optional SCOPE predicate (the Iceberg
    *   rewrite_data_files `where` filter): only live files actually
    *   containing matching rows (a stats-pruned scan verifies — see
    *   [[filesMatching]]) are rewritten; the rest of the table is
    *   untouched.
    *   At scale this is the only usable shape — a 100 TB table compacts
    *   one partition's small-file debt without rewriting 100 TB.
    *   Tombstones applicable to in-scope files fold into the rewrite
    *   (rewritten files' NEW add-sequence is above every live tombstone,
    *   so nothing re-applies or double-deletes); tombstone FILES are
    *   retired only on a full compact, since out-of-scope data may
    *   still need them. */
  /** Iceberg binpack-style SMALL-FILE compaction: rewrite ONLY live
    * data files smaller than `smallFileBytes` (default ¾ of the
    * target), binpacked toward `targetFileBytes` outputs; right-sized
    * files are never touched and a partition with fewer than
    * `minInputFiles` small files is skipped (rewriting one file buys
    * nothing). This is the steady-state maintenance shape for a 100 TB
    * table fed by streaming micro-batches: each trigger lands small
    * files, and the nightly binpack's WRITE AMPLIFICATION is bounded by
    * the small-file bytes — never the table size, which `compact()`
    * (full rewrite) or `compactToSize` (scoped by rows, not file size)
    * cannot promise. MOR tombstones fold into the rewritten subset
    * exactly as in partial `compact` (live delete files are kept — they
    * may still apply to untouched files). Returns the commit's snapshot
    * id, or None when no partition met the trigger (no commit). */
  def compactSmallFiles(targetFileBytes: Long = 128L * 1024 * 1024,
      smallFileBytes: Long = 0L, minInputFiles: Int = 2): Option[Long] = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    require(minInputFiles >= 2,
      "minInputFiles must be >= 2 — rewriting a single file buys nothing")
    val thr =
      if (smallFileBytes > 0) smallFileBytes else targetFileBytes * 3 / 4
    val parentAtRead = latestSnapshotId
    val live = liveFiles()
    val known = bytesFor(live)
    // files without a recorded size are SKIPPED rather than stat'd — a
    // driver-side getFileStatus per unknown file is an RPC storm at real
    // file counts; an unknown-size file picks up a recorded size at its
    // next rewrite and becomes compactable then
    val groups: Map[Map[String, String], Seq[(String, Long)]] = live
      .flatMap(f => known.get(f).map(f -> _))
      .filter(_._2 < thr)
      .groupBy(fb => partitionValues(fb._1))
      .filter(_._2.size >= minInputFiles)
    if (groups.isEmpty) return None
    val removed = groups.values.flatten.map(_._1).toSeq
    // output-file count PER PARTITION GROUP: a global ceil(total/target)
    // would let small files spanning many partitions land each dir far
    // under targetFileBytes (one global task count spread across dirs)
    val nByGroup: Map[Map[String, String], Int] = groups.map {
      case (k, fls) => k -> math.max(1L,
        (fls.map(_._2).sum + targetFileBytes - 1) / targetFileBytes).toInt
    }
    // MOR-aware scoped read: tombstoned rows of the rewritten files do
    // not resurrect; new files' sequence exceeds every live delete's
    val scoped = readFilesOf(removed)
    val fields = partitionFields
    val df =
      if (fields.isEmpty) scoped.coalesce(nByGroup.values.head)
      else {
        // route each row to one of its GROUP's nGroup output slots: the
        // clustered write then produces ~ceil(groupBytes/target) files
        // per dir. Group lookup is a broadcast join on the partition
        // tuple (rendered with the same Cast-to-string discipline the
        // partition-path writer uses); the salt hashes the row within
        // its group.
        val Sentinel = "__HIVE_DEFAULT_PARTITION__"
        val physCols = fields.map(f => coalesce(PartitionTransforms
          .columnFor(f, col(f.source).cast(schema(f.source).dataType),
            schema(f.source).dataType).cast("string"), lit(Sentinel))
          .as(s"__cmp_${f.physName}"))
        val nRows = nByGroup.toSeq.map { case (kv, ng) =>
          Row.fromSeq(fields.map(f =>
            kv.getOrElse(f.physName, Sentinel)) :+ ng)
        }
        val nSchema = org.apache.spark.sql.types.StructType(
          fields.map(f => org.apache.spark.sql.types.StructField(
            s"__cmp_${f.physName}",
            org.apache.spark.sql.types.StringType)) :+
            org.apache.spark.sql.types.StructField("__cmp_n",
              org.apache.spark.sql.types.IntegerType))
        val nDf = spark.createDataFrame(
          spark.sparkContext.parallelize(nRows, 1), nSchema)
        val keyed = scoped.select(col("*") +: physCols: _*)
          .join(broadcast(nDf), fields.map(f => s"__cmp_${f.physName}"))
        val salt = pmod(xxhash64(schema.fieldNames.map(col)
          .toIndexedSeq: _*), col("__cmp_n")).as("__cmp_salt")
        val totalFiles = math.max(1, nByGroup.values.sum)
        keyed.select(col("*"), salt)
          .repartition(totalFiles,
            fields.map(f => col(s"__cmp_${f.physName}")) :+
              col("__cmp_salt"): _*)
          .drop((fields.map(f => s"__cmp_${f.physName}") ++
            Seq("__cmp_n", "__cmp_salt")).toIndexedSeq: _*)
      }
    val staged = stageAndMove(align(df, schema), partitionCols,
      clustered = true)
    val added = staged.map(_._1)
    val sr = collectStats(added)
    Some(commit("compact", added, removed, _ => schema.json,
      partitionCols, expectedParent = parentAtRead, stats = sr._1,
      rows = sr._2, bytes = staged.toMap))
  }

  /** Z-ORDER compaction: rewrite the (scoped) live set clustered by the
    * interleaved z-value of `cols`, so multi-dimensional range predicates
    * prune files on EVERY listed column — `compact(sortBy)` clusters one
    * sort prefix; this is the `OPTIMIZE ... ZORDER BY` maintenance shape.
    * Same commit semantics as [[compact]] (tombstones folded, incremental
    * reads blocked across it, history time-travelable). */
  def compactZOrder(cols: Seq[String], bits: Int = 12,
      filesPerPartition: Int = 1, where: Option[Column] = None): Long = {
    require(cols.nonEmpty, "zorder needs at least one column")
    val parentAtRead = latestSnapshotId
    val all = liveFiles()
    val removed = where match {
      case Some(c) => filesMatching(all, c)
      case None => all
    }
    if (removed.isEmpty) return parentAtRead.getOrElse(
      throw new IllegalStateException(s"no such table: $location"))
    val full = removed.size == all.size
    val df0 = if (full) read() else readFilesOf(removed)
    val df = graft.operators.ZOrder.arrange(df0, cols, bits,
      Some(math.max(filesPerPartition, 1)))
    val staged = stageAndMove(align(df, schema), partitionCols,
      clustered = true)
    val added = staged.map(_._1)
    val sr = collectStats(added)
    commit("compact", added, removed, _ => schema.json, partitionCols,
      expectedParent = parentAtRead, stats = sr._1, rows = sr._2,
      removeDeletes = if (full) liveDeletes().map(_.path) else Seq.empty,
      bytes = staged.toMap)
  }

  /** TRUNCATE: one commit removing every live data file (and retiring
    * live tombstones — nothing left for them to apply to). History stays
    * time-travelable; expire reclaims the bytes later. This is the ONLY
    * correct truncate for a snapshot-log table — Spark's v1
    * TruncateTableCommand would rm the table directory, snapshot log
    * included (the SQL rule intercepts it into this). */
  def truncate(): Long = {
    require(exists, s"no such table: $location")
    val parentAtRead = latestSnapshotId
    commit("overwrite", Seq.empty, liveFiles(), _ => schema.json,
      partitionCols, expectedParent = parentAtRead,
      removeDeletes = liveDeletes().map(_.path))
  }

  def compact(filesPerPartition: Int = 1,
      sortBy: Seq[String] = Seq.empty,
      where: Option[Column] = None): Long = {
    val parentAtRead = latestSnapshotId
    val all = liveFiles()
    val removed = where match {
      case Some(c) => filesMatching(all, c)
      case None => all
    }
    if (removed.isEmpty) return parentAtRead.getOrElse(
      throw new IllegalStateException(s"no such table: $location"))
    val full = removed.size == all.size
    // the scoped read is MOR-aware, so compaction FOLDS tombstones into
    // the rewritten data — the Iceberg rewrite_data_files +
    // rewrite_position_delete_files pair in one.
    val df0 = if (full) read() else readFilesOf(removed)
    val df =
      if (sortBy.nonEmpty)
        df0.repartitionByRange(math.max(filesPerPartition, 1),
          sortBy.map(col): _*).sortWithinPartitions(sortBy.map(col): _*)
      else df0.coalesce(math.max(filesPerPartition, 1))
    // compaction pins its own layout (coalesce / range-cluster) — hash
    // write distribution must not reshuffle it
    val staged = stageAndMove(align(df, schema), partitionCols,
      clustered = true)
    val added = staged.map(_._1)
    val sr = collectStats(added)
    // tombstone files stay on disk for time travel; expire removes them
    commit("compact", added, removed, _ => schema.json, partitionCols,
      expectedParent = parentAtRead, stats = sr._1, rows = sr._2,
      removeDeletes = if (full) liveDeletes().map(_.path) else Seq.empty,
      bytes = staged.toMap)
  }

  /** Retire tombstone FILES that no longer apply to ANY live data file —
    * dangling deletes, the cleanup half of Iceberg's
    * rewrite_position_delete_files. Scoped compacts strand tombstones by
    * design (rewritten files' new add-sequence is above every tombstone,
    * but out-of-scope files may still need them); once the last
    * applicable file is rewritten the tombstone is inert, yet still
    * counts against the auto-fold threshold and the morRead group count.
    * This is a ZERO-FILE metadata commit: a tombstone is dangling when
    * no live file is strictly older than its sequence (equality), or —
    * for position tombstones — none of its NAMED files is both live and
    * older. Tombstone parquet stays on disk for time travel; expire
    * collects it. */
  def pruneDanglingDeletes(): Long = {
    val parentAtRead = latestSnapshotId
    val deletes = liveDeletes()
    if (deletes.isEmpty) return parentAtRead.getOrElse(
      throw new IllegalStateException(s"no such table: $location"))
    val addSeq = fileAddSeqs(None)
    val live = liveFiles()
    def applies(d: DeleteFile): Boolean = {
      val candidates = live.filter(f =>
        d.seq > addSeq.getOrElse(f, Long.MaxValue))
      if (candidates.isEmpty) false
      else if (!d.isPosition) true // keys may hit any older file
      else {
        val named = spark.read.parquet(s"$location/${d.path}")
          .select("file_path").distinct().collect()
          .map(_.getString(0)).toSet
        candidates.exists(named.contains)
      }
    }
    val dangling = deletes.filterNot(applies)
    if (dangling.isEmpty) return parentAtRead.get
    commit("prune-deletes", Seq.empty, Seq.empty, _ => schema.json,
      partitionCols, expectedParent = parentAtRead,
      removeDeletes = dangling.map(_.path))
  }

  /** Retrofit stable field ids onto a LEGACY name-mapped table (one whose
    * create predates [[FieldIds]]), unlocking RENAME COLUMN. Safe only as
    * a rewrite: existing footers carry no parquet field ids, and Spark's
    * id-based resolution (SPARK-38094) does not fall back to names — an
    * id-carrying schema over id-less files would null or refuse, so the
    * schema may flip to ids ONLY in the same commit that replaces every
    * live file with id-stamped rewrites. This is that commit: a
    * compact-shaped rewrite (MOR-folding, like [[compact]]) whose new
    * schema carries ids 1..n in field order. Time travel is unaffected —
    * pre-retrofit snapshots keep their id-less schemas and resolve their
    * own (id-less) files by name, exactly as before. Data-equivalent for
    * the changelog (no CDC rows), a rewrite barrier for incremental
    * scans (like compact). No-op on tables already carrying ids. */
  def retrofitFieldIds(
      targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    require(exists, s"no such table: $location")
    require(branchName.isEmpty, "retrofit must run on the main table")
    val parentAtRead = latestSnapshotId
    val cur = schema
    // fullyStamped, not hasIds: a top-level-id'd table whose NESTED
    // parts predate nested stamping still needs the rewrite (its
    // footers lack the nested ids an id-aware reader would request).
    // New ids allocate ABOVE anything any historical schema ever used
    // — a dropped column's id must never resurrect as a nested leaf's
    // (external id-aware readers of earlier exports would silently
    // rebind it)
    if (FieldIds.fullyStamped(cur)) return parentAtRead.get
    val withIds = FieldIds.assign(cur,
      floor = FieldIds.maxId(snapshots.map(s =>
        DataType.fromJson(s.schemaJson).asInstanceOf[StructType])))
    val removed = liveFiles()
    val staged =
      if (removed.isEmpty) Seq.empty
      else {
        val n = math.max(1L, (bytesOf(removed) + targetFileBytes - 1)
          / targetFileBytes).toInt
        stageAndMove(align(read().coalesce(n), withIds), partitionCols,
          clustered = true)
      }
    val added = staged.map(_._1)
    val sr = collectStats(added)
    commit("retrofit", added, removed, _ => withIds.json, partitionCols,
      expectedParent = parentAtRead, stats = sr._1, rows = sr._2,
      removeDeletes = liveDeletes().map(_.path), bytes = staged.toMap)
  }

  /** Manifest compaction (the Iceberg rewrite_manifests action): commit a
    * BASE-STATE snapshot whose single fresh manifest carries the entire
    * live state — files with their stats, row counts, sizes, and ORIGINAL
    * add-sequences, plus live tombstones with original sequences. Data
    * files are untouched and history is preserved (older reads replay
    * from their own earlier base), but every resolution at or after this
    * snapshot parses only the manifests committed SINCE it — the cure for
    * long-lived tables whose chain has accumulated thousands of small
    * per-commit manifests. Incremental scans refuse to cross it, like any
    * rewrite. */
  def rewriteManifests(): Long = {
    val parentAtRead = latestSnapshotId
    val files = liveFiles()
    commit("rewrite-manifests", files, Seq.empty, _ => schema.json,
      partitionCols, expectedParent = parentAtRead,
      stats = statsFor(files), rows = rowsFor(files),
      bytes = bytesFor(files), seqs = fileAddSeqs(None),
      reAddDeletes = liveDeletes(), base = true)
  }

  /** Rollback: make `snapshotId`'s state current again via a NEW snapshot
    * (the Iceberg rollback_to_snapshot action). History is preserved —
    * time travel to the rolled-back-over states still works. */
  def rollback(snapshotId: Long): Long = {
    val parentAtRead = latestSnapshotId
    val target = liveFiles(Some(snapshotId))
    val current = liveFiles()
    // restore the delete-file set too, with ORIGINAL sequences (reAdd) —
    // otherwise rolled-back tombstones would stop applying (fresh seq) or
    // deleted rows would resurrect (tombstone missing)
    val targetDel = liveDeletes(Some(snapshotId))
    val currentDel = liveDeletes()
    val currentDelPaths = currentDel.map(_.path).toSet
    val targetDelPaths = targetDel.map(_.path).toSet
    // re-added files carry their ORIGINAL add-sequences explicitly — with
    // base-state replay their first adds may lie behind a later base, and
    // a fresh sequence would detach them from their tombstones
    val reAdded = target.diff(current)
    val seqsAtTarget = fileAddSeqs(Some(snapshotId))
    commit("rollback", reAdded, current.diff(target),
      _ => schema.json, partitionCols, expectedParent = parentAtRead,
      reAddDeletes = targetDel.filterNot(d => currentDelPaths.contains(d.path)),
      removeDeletes = currentDel.map(_.path).filterNot(targetDelPaths.contains),
      seqs = reAdded.flatMap(f => seqsAtTarget.get(f).map(f -> _)).toMap,
      bytes = bytesFor(reAdded, Some(snapshotId)))
  }

  /** Snapshot expiration (the Iceberg expire_snapshots action): retain the
    * last `keepLast` snapshots; the oldest retained snapshot is rewritten
    * as a baseline holding its cumulative live file set, older metadata is
    * deleted, and data files no longer reachable from any retained
    * snapshot are physically removed. Returns deleted data files. */
  /** Age-based retention (Iceberg's `expire_snapshots(older_than)`
    * form): expire snapshots committed strictly before `cutoffMs`,
    * always retaining at least `retainLast` (default 1) regardless of
    * age. Reduces to [[expireSnapshots]] with the computed suffix
    * length, so tag pinning and baseline semantics are identical. */
  def expireOlderThan(cutoffMs: Long, retainLast: Int = 1): Seq[String] = {
    require(retainLast >= 1, "must retain at least one snapshot")
    val newer = snapshots.count(_.timestampMs >= cutoffMs)
    expireSnapshots(math.max(retainLast, newer))
  }

  def expireSnapshots(keepLast: Int): Seq[String] = {
    require(branchName.isEmpty, "expireSnapshots must run on the main table")
    require(keepLast >= 1, "must retain at least one snapshot")
    val all = snapshots
    // tagged snapshots are pinned (Iceberg ref-retention): expiring one
    // would silently empty every read through its tag. Retention is
    // SUFFIX-shaped by design — the chain replays linearly from one
    // baseline, so everything at or after the oldest live tag is kept
    // (drop stale tags to release their history). Tags pointing outside
    // the chain (already absorbed, or garbage) pin nothing. Branch fork
    // points pin identically: a branch replays main up to its fork, so
    // expiring the fork out from under it would empty the branch's reads.
    val chainIds = all.map(_.snapshotId).toSet
    val tagged = (refs.values ++ branches.values).filter(chainIds.contains)
    val keep =
      if (tagged.isEmpty) keepLast
      else math.max(keepLast,
        all.size - all.indexWhere(_.snapshotId == tagged.min))
    if (all.size <= keep) return Seq.empty
    val retained = all.takeRight(keep)
    val expired = all.dropRight(keep)
    val oldest = retained.head

    // baseline: the oldest retained snapshot absorbs the history below it.
    // Its per-file payload (carried files + their stats, row counts and
    // ORIGINAL add-sequences — all would otherwise be lost with the
    // expired snapshots) goes into a fresh manifest; live tombstones are
    // carried with original sequences so "delete at seq D applies below D"
    // keeps holding after the adding snapshots are gone. Replacement is a
    // single atomic OVERWRITE rename — a crash can leave the old or the
    // new baseline, never a hole in the chain.
    val baselineFiles = liveFiles(Some(oldest.snapshotId))
    val baselineStats = statsFor(baselineFiles)
    val baselineDeletes = liveDeletes(Some(oldest.snapshotId))
    val baselineSeqs = fileAddSeqs(Some(oldest.snapshotId))
    val baselineRows = rowsFor(baselineFiles)
    // cleanup candidates are computed BEFORE the expired manifests go away
    val candidates = (expired.flatMap(s => entriesOf(s).map(_.path)) ++
      expired.flatMap(_.addedDeleteFiles.toSeq.flatten.map(_.path)) ++
      expired.flatMap(_.removedDeleteFiles.toSeq.flatten)).distinct
    val retainedTailAdds = retained.tail.flatMap(addedFilesOf)

    val baselineBytes = bytesFor(baselineFiles, Some(oldest.snapshotId))
    val baselineEntries = baselineFiles.map(f => ManifestEntry(f, "add",
      stats = baselineStats.get(f).filter(_.nonEmpty),
      rows = baselineRows.get(f), seq = baselineSeqs.get(f),
      bytes = baselineBytes.get(f)))
    val baselineManifest =
      if (baselineEntries.isEmpty) None
      else Some(writeManifest(baselineEntries, oldest.partitionCols))
    // idempotent-writer stamps on EXPIRED snapshots must survive the
    // truncation or a replaying writer double-applies its last batch:
    // absorb the max batch per appId (incl. stamps a previous expire
    // already absorbed onto the old baseline) into the new baseline
    val absorbedStamps: Map[String, Long] = {
      val pairs = (expired :+ oldest).flatMap(s =>
        s.txnAppId.zip(s.txnBatchId).toSeq ++
          s.txnStamps.getOrElse(Map.empty).toSeq)
      pairs.groupBy(_._1).map { case (a, ps) => a -> ps.map(_._2).max }
    }
    val baseline = oldest.copy(
      parentId = None,
      addedFiles = Seq.empty,
      removedFiles = Seq.empty,
      fileStats = None,
      fileRows = None,
      fileSeqs = None,
      addedDeleteFiles =
        if (baselineDeletes.isEmpty) None else Some(baselineDeletes),
      removedDeleteFiles = None,
      base = Some(true),
      txnStamps =
        if (absorbedStamps.isEmpty) None else Some(absorbedStamps),
      manifest = baselineManifest)
    val tmp = new Path(metaPath, s".tmp-${UUID.randomUUID()}.json")
    val out = fs.create(tmp, false)
    try out.write(Snapshot.toJson(baseline).getBytes("UTF-8")) finally out.close()
    val dest = new Path(metaPath, snapFileName(oldest.snapshotId))
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      tablePath.toUri, spark.sessionState.newHadoopConf())
    fc.rename(tmp, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)

    // expired snapshot records, their manifests, and the oldest's
    // superseded pre-baseline manifest are all unreachable now
    expired.foreach { s =>
      fs.delete(new Path(metaPath, snapFileName(s.snapshotId)), false)
      s.manifest.foreach(m => fs.delete(new Path(tablePath, m.path), false))
      // expired commits' materialized CDC files are unreachable too
      fs.delete(changesPath(s.snapshotId), true)
    }
    oldest.manifest.foreach(m =>
      fs.delete(new Path(tablePath, m.path), false))

    // physical cleanup: files referenced by no retained snapshot state
    // (delete files follow the same rule)
    val reachable = (baselineFiles ++ retainedTailAdds ++
      baselineDeletes.map(_.path) ++
      retained.tail.flatMap(_.addedDeleteFiles.toSeq.flatten.map(_.path))).toSet
    val orphans = candidates.filterNot(reachable.contains)
    orphans.foreach(f => fs.delete(new Path(tablePath, f), false))
    orphans
  }

  /** Orphan cleanup (the Iceberg remove_orphan_files action): delete data
    * files under the table dir that no snapshot references (e.g. left by a
    * crashed write between stage-move and commit). Only files older than
    * `olderThanMs` are touched — an in-flight writer that has moved files
    * in but not yet committed its snapshot must not lose them (Iceberg's
    * default guard is 3 days). Returns deleted files. */
  def removeOrphanFiles(
      olderThanMs: Long = 3L * 24 * 60 * 60 * 1000): Seq[String] = {
    require(branchName.isEmpty, "removeOrphanFiles must run on the main table")
    // pending (write-audit-publish) writes are referenced by their
    // marker, not by a snapshot — they are awaiting audit, not orphaned
    val pending = fs.globStatus(new Path(metaPath, "pending-*.json"))
      .toSeq.flatMap { st =>
        val name = st.getPath.getName
          .stripPrefix("pending-").stripSuffix(".json")
        try pendingEntries(name)._2.map(_.path)
        catch { case _: Exception => Seq.empty }
      }
    // unpublished branch commits reference real staged files — awaiting
    // fastForward, not orphaned
    val branchReferenced = branches.keys.toSeq.flatMap(b =>
      branchOnlySnapshots(b).flatMap(s =>
        addedFilesOf(s) ++ s.addedDeleteFiles.toSeq.flatten.map(_.path)))
    val chain = snapshots
    val referenced = (chain.flatMap(s =>
      addedFilesOf(s) ++ s.addedDeleteFiles.toSeq.flatten.map(_.path)) ++
      pending ++ branchReferenced).toSet
    // materialized CDC dirs are referenced by their snapshot's existence
    // (no manifest entry); abandoned .tmp- staging dirs age out normally
    val liveChangeDirs = chain.map(s => s"_changes/${s.snapshotId}/").toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    val it = fs.listFiles(tablePath, true)
    val orphans = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      val rel = stripPrefix(f.getPath.toString, tablePath.toString)
      if (f.getPath.getName.endsWith(".parquet") &&
          !rel.startsWith("_graft") &&
          // metadata/ is the Iceberg export tree: its converted
          // position-delete parquet is referenced by Avro manifests the
          // snapshot log cannot see
          !rel.startsWith("metadata/") &&
          !liveChangeDirs.exists(rel.startsWith) &&
          !referenced.contains(rel) &&
          f.getModificationTime < cutoff) {
        orphans += rel
        fs.delete(f.getPath, false)
      }
    }
    orphans.toSeq
  }

  /** Relative paths of live files that CONTAIN rows where `cond` is TRUE
    * — one probe scan with predicate pushdown; the rewrite is then
    * bounded by these files, not the table. The probe reads bare files
    * (tombstoned rows may over-match: they only add a file that the
    * MOR-aware rewrite cleans anyway). */
  private def filesMatching(live: Seq[String], cond: Column): Seq[String] = {
    if (live.isEmpty) return Seq.empty
    // keyed by full table-relative path, NOT basename: identical part-NNNNN
    // basenames across partition dirs would collapse in a basename map and
    // the rewrite would target the wrong file (silent row loss)
    val liveSet = live.toSet
    readFiles(live).filter(cond <=> lit(true))
      .select(input_file_name().as("__f")).distinct().collect()
      .map(r => relOfScanPath(r.getString(0)))
      .filter(liveSet.contains).toSeq
  }

  /** SQL DELETE FROM semantics: copy-on-write rewrite of ONLY the files
    * containing matching rows. Rows where the predicate evaluates to NULL
    * are KEPT (SQL deletes where the condition is TRUE). Table property
    * `graft.delete.mode=mor` (the Iceberg write.delete.mode=merge-on-read
    * analogue) routes to [[deletePositions]] instead — O(matched rows)
    * written, nothing rewritten. */
  def delete(cond: Column): Long =
    if (properties.get("graft.delete.mode").contains("mor"))
      deletePositions(cond)
    else {
    val parentAtRead = latestSnapshotId
    val matched = filesMatching(liveFiles(), cond)
    if (matched.isEmpty) return parentAtRead.getOrElse(
      throw new IllegalStateException(s"no such table: $location"))
    val kept = readFilesOf(matched).filter(!(cond <=> lit(true)))
    val staged = stageAndMove(align(kept, schema), partitionCols)
    val sr = collectStats(staged.map(_._1))
    commit("delete", staged.map(_._1), matched, _ => schema.json,
      partitionCols, expectedParent = parentAtRead,
      stats = sr._1, rows = sr._2, bytes = staged.toMap)
  }

  /** The scan-time URI of a table-relative file — the exact string
    * `_metadata.file_path` renders (FileStatus path of the qualified
    * Path). Position-delete translation depends on this prediction, so
    * [[deletePositions]] VERIFIES it against observed scan paths on
    * every write and fails loudly on any mismatch. */
  private[table] def scanUriOf(rel: String): String =
    fs.makeQualified(new Path(tablePath, rel)).toString

  /** MOR point delete via POSITION deletes (the Iceberg v2 second delete
    * encoding): rows where `cond` is TRUE are tombstoned as
    * (file_path, pos) pairs — `pos` the parquet row ordinal
    * (`_metadata.row_index`) in the table-relative `file_path` — and the
    * read applies them file-locally. Nothing is rewritten: the commit
    * writes O(matched rows), not O(matched files), which is the cheaper
    * encoding for point deletes at scale (a COW delete of 100 rows
    * spread over 100 large files rewrites all of them; this writes one
    * tiny tombstone file). Stats-pruned like the COW path: only files
    * whose min/max/Bloom can contain a match are scanned. Concurrent
    * appends/merges do not conflict (nothing removed — an append-shaped
    * commit); positions are immutable facts about the named files, so
    * late application stays correct, and like equality deletes the
    * tombstone applies only to files added strictly before its sequence.
    * But a concurrent REWRITE (compact/fold/COW) that retires a named
    * file would strand the tombstone on dead files — silently dropping
    * the delete — so the commit re-validates its named files live at
    * the tip on every publish attempt and conflicts if one vanished
    * (Iceberg's validateDataFilesExist). Auto-folds past the
    * live-tombstone threshold like MOR merges. */
  def deletePositions(cond: Column): Long = {
    val live = liveFiles()
    val matched = filesMatching(live, cond)
    if (matched.isEmpty) return latestSnapshotId.getOrElse(
      throw new IllegalStateException(s"no such table: $location"))
    // predicted scan URIs (driver-side) are the join bridge between
    // table-relative paths and `_metadata.file_path`; verified below
    val relByUri = matched.map(f => scanUriOf(f) -> f).toMap
    val hits = readFiles(matched)
      .filter(cond <=> lit(true))
      .select(col("_metadata.file_path").as("__uri"),
        col("_metadata.row_index").as("pos"))
    val lookup = spark.createDataFrame(relByUri.toSeq)
      .toDF("__uri", "file_path")
    val joined = hits.join(broadcast(lookup), Seq("__uri"), "left")
      .select(col("__uri"), col("file_path"), col("pos"))
      .cache()
    try {
      val unmatched = joined.filter(col("file_path").isNull)
        .select("__uri").distinct().collect().map(_.getString(0))
      require(unmatched.isEmpty,
        "position-delete path translation failed: scan reported file " +
          s"URIs not predicted by scanUriOf — ${unmatched.take(3).mkString(", ")}")
      val positions = joined.select("file_path", "pos")
      val nRows = positions.count()
      if (nRows == 0) return latestSnapshotId.get
      val hitFiles = positions.select("file_path").distinct()
        .collect().map(_.getString(0)).toSeq
      val staged = stageDeletes(positions.orderBy("file_path", "pos"), nRows)
      val id = commit("delete", Seq.empty, Seq.empty, _ => schema.json,
        partitionCols, addDeletePaths = staged,
        addDeleteContent = Some("position"), requireLiveFiles = hitFiles)
      val maxLive = properties.getOrElse("graft.merge.mor.max-delete-files",
        GraftTable.MorMaxLiveDeleteFiles.toString).toInt
      if (liveDeletes().size > maxLive) {
        try return foldDeletes()
        catch { case _: java.util.ConcurrentModificationException => }
      }
      id
    } finally joined.unpersist()
  }

  /** MOR point update via POSITION deletes (the Iceberg
    * write.update.mode=merge-on-read analogue): rows where `cond` is
    * TRUE are tombstoned as (file_path, pos) pairs and their updated
    * versions appended as new data files — ONE atomic commit, nothing
    * rewritten. Write cost is O(matched rows), not O(matched files): a
    * 100-row update spread over 100 large files writes ~100 rows + one
    * tiny tombstone file where COW rewrites every touched file. The
    * tombstone's sequence equals the commit's, and position deletes
    * apply only to files added strictly earlier — so the same-commit
    * updated rows are untouched by construction. The matched-row scan is
    * MOR-aware ([[morRead]] keepPos): rows already dead under live
    * tombstones can never be resurrected as "updated". Unlike
    * [[deletePositions]] (append-shaped, conflict-free), an update is a
    * read-modify-write: it pins `expectedParent`, so a concurrent commit
    * aborts it (same isolation as the COW path) — otherwise two
    * concurrent updates of one row would each tombstone the original and
    * BOTH append their version, duplicating the row. */
  def updatePositions(set: Map[String, Column],
      cond: Option[Column]): Long = {
    val parentAtRead = latestSnapshotId
    val sch = schema
    set.keys.foreach(k => require(sch.fieldNames.contains(k),
      s"UPDATE SET column $k not in schema"))
    val live = liveFiles()
    val matched = cond match {
      case Some(c) => filesMatching(live, c)
      case None => live
    }
    if (matched.isEmpty) return parentAtRead.getOrElse(
      throw new IllegalStateException(s"no such table: $location"))
    val relByUri = matched.map(f => scanUriOf(f) -> f).toMap
    val hit = cond.map(_ <=> lit(true)).getOrElse(lit(true))
    val rows = morRead(matched, None, keepPos = true).filter(hit).cache()
    try {
      val lookup = spark.createDataFrame(relByUri.toSeq)
        .toDF(GraftTable.UriCol, "file_path")
      val joined = rows.select(col(GraftTable.UriCol),
          col(GraftTable.PosCol).as("pos"))
        .join(broadcast(lookup), Seq(GraftTable.UriCol), "left")
      val unmatched = joined.filter(col("file_path").isNull)
        .select(GraftTable.UriCol).distinct().collect().map(_.getString(0))
      require(unmatched.isEmpty,
        "position-delete path translation failed: scan reported file " +
          s"URIs not predicted by scanUriOf — ${unmatched.take(3).mkString(", ")}")
      val positions = joined.select("file_path", "pos")
      val nRows = positions.count()
      if (nRows == 0) return parentAtRead.get
      val updated = rows.select(sch.fieldNames.map { c =>
        set.get(c) match {
          case Some(v) => v.cast(sch(c).dataType).as(c)
          case None => col(c)
        }
      }.toIndexedSeq: _*)
      val staged = stageAndMove(align(updated, sch), partitionCols)
      val delStaged =
        stageDeletes(positions.orderBy("file_path", "pos"), nRows)
      val sr = collectStats(staged.map(_._1))
      val id = commit("update", staged.map(_._1), Seq.empty, _ => sch.json,
        partitionCols, expectedParent = parentAtRead,
        stats = sr._1, rows = sr._2, addDeletePaths = delStaged,
        addDeleteContent = Some("position"), bytes = staged.toMap)
      val maxLive = properties.getOrElse("graft.merge.mor.max-delete-files",
        GraftTable.MorMaxLiveDeleteFiles.toString).toInt
      if (liveDeletes().size > maxLive) {
        try return foldDeletes()
        catch { case _: java.util.ConcurrentModificationException => }
      }
      id
    } finally rows.unpersist()
  }

  /** SQL UPDATE semantics: rewrite only the files containing matching
    * rows, applying `set` to rows where `cond` is TRUE (all rows when
    * None); other rows in those files are carried unchanged. Table
    * property `graft.update.mode=mor` routes to [[updatePositions]]
    * instead — O(matched rows) written, nothing rewritten. */
  def update(set: Map[String, Column], cond: Option[Column]): Long =
    if (properties.get("graft.update.mode").contains("mor"))
      updatePositions(set, cond)
    else {
    val parentAtRead = latestSnapshotId
    val sch = schema
    set.keys.foreach(k => require(sch.fieldNames.contains(k),
      s"UPDATE SET column $k not in schema"))
    val live = liveFiles()
    val matched = cond match {
      case Some(c) => filesMatching(live, c)
      case None => live
    }
    if (matched.isEmpty) return parentAtRead.getOrElse(
      throw new IllegalStateException(s"no such table: $location"))
    val hit = cond.map(_ <=> lit(true)).getOrElse(lit(true))
    val updated = readFilesOf(matched).select(sch.fieldNames.map { c =>
      set.get(c) match {
        case Some(v) => when(hit, v.cast(sch(c).dataType))
          .otherwise(col(c)).as(c)
        case None => col(c)
      }
    }.toIndexedSeq: _*)
    val staged = stageAndMove(align(updated, sch), partitionCols)
    val sr = collectStats(staged.map(_._1))
    commit("update", staged.map(_._1), matched, _ => sch.json,
      partitionCols, expectedParent = parentAtRead,
      stats = sr._1, rows = sr._2, bytes = staged.toMap)
  }

  /** J1: MERGE INTO — see [[MergeInto.merge]]. `opCol` opts into the
    * CDC-delete extension (WHEN MATCHED AND op='D' THEN DELETE).
    * `mode`: "cow" (default) rewrites overlapping files; "mor" writes
    * key-tombstone delete files instead (merge-on-read, the reference's
    * silver table format, /root/reference/bronze-silver.py:184-194);
    * "auto" picks MOR when the rewrite would be large relative to the
    * batch. */
  def merge(source: DataFrame, keys: Seq[String], dedupKey: Seq[String],
      orderCol: String, opCol: Option[String] = None,
      deleteOps: Seq[String] = Seq("D"), mode: String = "cow",
      // idempotent-writer stamp, same contract as append(txn=...): a
      // (appId, batchId) already at-or-below the last committed batch
      // for appId makes the merge a no-op — exactly-once incremental
      // consumers (TableFeed, IncrementalRollup) replay crashes safely
      txn: Option[(String, Long)] = None,
      // column-level WHEN MATCHED THEN UPDATE SET (see MergeInto.merge)
      updateSet: Option[Seq[(String, org.apache.spark.sql.Column)]] = None,
      // WHEN NOT MATCHED BY SOURCE THEN DELETE (see MergeInto.merge)
      syncDelete: Boolean = false,
      // WHEN MATCHED AND <cond> THEN UPDATE (see MergeInto.merge)
      updateCond: Option[org.apache.spark.sql.Column] = None,
      // residual ANSI clause shapes (see MergeInto.MergeExtras)
      extras: MergeInto.MergeExtras = MergeInto.MergeExtras()): Long =
    MergeInto.merge(spark, this, source, keys, dedupKey, orderCol, opCol,
      deleteOps, mode, txn, updateSet, syncDelete, updateCond, extras)

  private[table] def commitMerge(staged: Seq[(String, Long)],
      removed: Seq[String], expectedParent: Option[Long],
      txn: Option[(String, Long)] = None): Long = {
    val added = staged.map(_._1)
    val sr = collectStats(added)
    commit("merge", added, removed, _ => schema.json, partitionCols,
      expectedParent = expectedParent, stats = sr._1, rows = sr._2,
      txn = txn, bytes = staged.toMap)
  }

  /** MOR merge commit: new data files + one equality-delete file, nothing
    * rewritten or removed — so unlike a COW merge it does NOT conflict
    * with concurrent commits: on a publish collision it retries against
    * the new tip like an append. This is sound because the tombstone's
    * sequence is assigned at commit time: whatever interleaving wins, the
    * result equals running the merges in commit order (last-committed
    * wins per key — the same answer sequential merges give). Concurrent
    * CDC upsert streams therefore never abort each other. */
  private[table] def commitMergeMor(staged: Seq[(String, Long)],
      deleteStaged: Seq[(String, Long)], keyCols: Seq[String],
      txn: Option[(String, Long)] = None,
      // a MOR merge that READ target values (partial/conditional
      // update: read-modify-write) must CAS on the snapshot it read —
      // committing append-like would silently lose a concurrent
      // writer's update to the same keys. Plain full-row MOR merges
      // pass None and stay append-like (last-committed-wins per key is
      // their honest semantics).
      expectedParent: Option[Long] = None): Long = {
    val added = staged.map(_._1)
    val sr = collectStats(added)
    val id = commit("merge", added, Seq.empty, _ => schema.json,
      partitionCols, stats = sr._1, rows = sr._2,
      addDeletePaths = deleteStaged, addDeleteCols = Some(keyCols),
      txn = txn, bytes = staged.toMap,
      expectedParent = expectedParent)
    // auto-fold: a long-running MOR stream must not degrade until an
    // operator remembers to compact — once live tombstone files exceed
    // the threshold, fold them into the (bounded set of) affected data
    // files. Amortized: one partial rewrite per N merges, and morRead's
    // plan stays O(threshold) by construction. A concurrent-commit
    // conflict just skips the fold — the merge itself is committed, and
    // the next merge past the threshold retries it.
    val maxLive = properties.getOrElse("graft.merge.mor.max-delete-files",
      GraftTable.MorMaxLiveDeleteFiles.toString).toInt
    if (liveDeletes().size > maxLive) {
      try return foldDeletes()
      catch { case _: java.util.ConcurrentModificationException => }
    }
    id
  }

  /** Fold live MOR tombstones into the data: rewrite ONLY the data files
    * that have applicable deletes (group-wise anti-joins, same plan as
    * the read) and retire every live delete file. Untouched files carry
    * forward by reference, so the cost is bounded by TOMBSTONED bytes,
    * not table size — Iceberg's rewrite_position_delete_files analogue.
    * Time travel to pre-fold snapshots still sees the tombstones. */
  def foldDeletes(): Long = {
    val parentAtRead = latestSnapshotId
    val deletes = liveDeletes()
    if (deletes.isEmpty)
      return parentAtRead.getOrElse(
        throw new IllegalStateException(s"table does not exist: $location"))
    val addSeq = fileAddSeqs(None)
    val affected = liveFiles().filter(f =>
      deletes.exists(_.seq > addSeq.getOrElse(f, Long.MaxValue)))
    val staged =
      if (affected.isEmpty) Seq.empty
      else stageAndMove(align(morRead(affected, None), schema),
        partitionCols)
    val added = staged.map(_._1)
    val sr = collectStats(added)
    commit("fold", added, affected, _ => schema.json, partitionCols,
      expectedParent = parentAtRead, stats = sr._1, rows = sr._2,
      removeDeletes = deletes.map(_.path), bytes = staged.toMap)
  }

  private[table] def stageForMerge(df: DataFrame): Seq[(String, Long)] =
    stageAndMove(align(df, schema), partitionCols)

  /** Stage a tombstone key batch as parquet under `_deletes/`, returning
    * (path, bytes) pairs. Small batches (the common CDC case) write ONE
    * file from one task; a large forced-MOR batch is split across tasks
    * at ~[[GraftTable.MorDeleteFileRows]] rows per file, so the stage
    * write parallelizes instead of single-tasking an arbitrarily large
    * key set through coalesce(1). */
  private[table] def stageDeletes(keys: DataFrame,
      approxRows: Long): Seq[(String, Long)] = {
    val stage = new Path(metaPath, s"stage-del-${UUID.randomUUID()}")
    val nFiles = math.max(1L,
      (approxRows + GraftTable.MorDeleteFileRows - 1)
        / GraftTable.MorDeleteFileRows).toInt
    val shaped =
      if (nFiles == 1) keys.coalesce(1) else keys.repartition(nFiles)
    shaped.write
      // same committer rationale as stageAndMove: private stage dir,
      // real commit is the snapshot publish
      .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .parquet(stage.toString)
    val files = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    if (fs.getScheme == "file") {
      import scala.jdk.CollectionConverters._
      val stageDir = java.nio.file.Paths.get(stage.toUri.getPath)
      val delDir = java.nio.file.Paths.get(tablePath.toUri.getPath)
        .resolve("_deletes")
      java.nio.file.Files.createDirectories(delDir)
      val walk = java.nio.file.Files.walk(stageDir)
      try walk.iterator().asScala.foreach { p =>
        if (p.getFileName.toString.endsWith(".parquet")) {
          val rel = s"_deletes/del-${UUID.randomUUID()}.parquet"
          val dest = delDir.resolve(rel.stripPrefix("_deletes/"))
          java.nio.file.Files.move(p, dest)
          files += ((rel, java.nio.file.Files.size(dest)))
        }
      } finally walk.close()
      deleteLocalRecursively(stageDir.toFile)
    } else {
      val it = fs.listFiles(stage, true)
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) {
          val rel = s"_deletes/del-${UUID.randomUUID()}.parquet"
          val dest = new Path(tablePath, rel)
          fs.mkdirs(dest.getParent)
          if (!fs.rename(f.getPath, dest))
            throw new IllegalStateException(s"failed to move $rel into $location")
          files += ((rel, f.getLen))
        }
      }
      fs.delete(stage, true)
    }
    files.toSeq
  }

  /** total on-disk bytes of `files` — manifest-recorded sizes, with a
    * getFileStatus fallback only for pre-size manifests. */
  private[table] def bytesOf(files: Seq[String]): Long = {
    val known = bytesFor(files)
    files.map(f => known.getOrElse(f,
      fs.getFileStatus(new Path(tablePath, f)).getLen)).sum
  }

  private[table] def readFilesOf(files: Seq[String]): DataFrame =
    morRead(files, None)
}

object GraftTable {
  def apply(spark: SparkSession, location: String): GraftTable =
    new GraftTable(spark, location)

  /** `expectedParent` sentinel asserting a PARENTLESS publish: pass
    * `Some(NoParentSentinel)` when the caller's decision was computed
    * against an EMPTY snapshot chain, so a concurrent first commit makes
    * this one conflict instead of landing silently on top of it.
    * (`expectedParent = None` means "no check", so a CAS caller must map
    * an empty-chain read to this sentinel, never to None.) Snapshot ids
    * are non-negative, so -1 can never name a real parent. */
  val NoParentSentinel: Long = -1L

  /** The tip a CAS caller should pass as `expectedParent`: the id it
    * read, or the parentless assertion when the chain was empty. */
  def casParent(tip: Option[Long]): Option[Long] =
    Some(tip.getOrElse(NoParentSentinel))

  /** The same type with every array/map/struct container marked
    * nullable — the widest nullability shape, always a legal cast
    * target from any same-typed value (see [[GraftTable.align]]). */
  private[table] def widenContainers(dt: DataType): DataType = dt match {
    case org.apache.spark.sql.types.ArrayType(et, _) =>
      org.apache.spark.sql.types.ArrayType(widenContainers(et),
        containsNull = true)
    case org.apache.spark.sql.types.MapType(k, v, _) =>
      org.apache.spark.sql.types.MapType(widenContainers(k),
        widenContainers(v), valueContainsNull = true)
    case StructType(fs) => StructType(fs.map(f =>
      f.copy(dataType = widenContainers(f.dataType), nullable = true)))
    case other => other
  }

  /** Auto-fold trigger: max live tombstone FILES before a MOR merge
    * commit folds them into the affected data files (property
    * `graft.merge.mor.max-delete-files` overrides). Bounds morRead's
    * plan at O(threshold) joins regardless of merge count. */
  val MorMaxLiveDeleteFiles: Int = 10

  /** Rows per staged tombstone file: batches under this write ONE file
    * from one task; larger forced-MOR batches split across tasks. */
  val MorDeleteFileRows: Long = 4L * 1000 * 1000

  /** Internal bridge columns for position-delete application: the scan's
    * `_metadata.file_path` / `_metadata.row_index`, renamed so they can
    * never collide with user schemas that shadow `_metadata`. */
  private[table] val UriCol = "__graft_scan_uri__"
  private[table] val PosCol = "__graft_scan_pos__"

  private val SnapCacheMax = 10000
  private val snapCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), Snapshot]()
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), Manifest]()

  /** Manifest-file parses (cache misses) — the observable evidence that a
    * partition-filtered plan read ONLY the manifests it needed. */
  val manifestParses = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Value-level scans launched by stats collection — stays at zero for
    * commits on tables without declared Bloom columns (bounds and row
    * counts come from parquet footers, never a second data scan). */
  val statsDataScans = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Drop the metadata parse caches (test hook: makes parse counters
    * measure a cold resolution). */
  def clearMetaCaches(): Unit = { snapCache.clear(); manifestCache.clear() }

  /** Is `v` a parseable snapshot id (bounded digit run — tag names must
    * start with a letter)? The ONE definition shared by [[GraftTable.refs]],
    * SQL `VERSION AS OF` dispatch, and ref-property validation, so a
    * string can never be classified differently across the three. */
  def isSnapshotIdString(v: String): Boolean =
    v.nonEmpty && v.length <= 18 && v.forall(_.isDigit)

  /** The publish primitive all commits go through — swap for stores
    * without an atomic rename-or-fail (see [[CommitLock]]). */
  @volatile var commitLock: CommitLock = LinkCommitLock
}

package graft.iceberg

import scala.sys.process._

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.table.GraftTable

/** Randomized lifecycle fuzz of the FOREIGN write-back surface: a
  * seeded op sequence (append / position delete / equality delete /
  * position merge / equality merge / compact / expire / time-travel
  * readback / orphan-listing invariant / SQL register / manifest
  * consolidation / tombstone consolidation / write-audit-publish)
  * drives one foreign Iceberg v2 tree, with a driver-side bag model as
  * the reference semantics. After EVERY op the importer's read must
  * bag-equal the model — so a wrong sequence-number rule, a tombstone
  * mis-scope, or a compaction that loses or resurrects one row fails
  * at the op that introduced it, not at the end. The finished tree is
  * then cross-checked by the external DuckDB hand-walk reader AND by
  * the `graft-iceberg` CDC streaming source (batch 0 must equal the
  * model as inserts).
  *
  * Standing invariants beyond the bag check:
  *   - every snapshot id seen is replayable: time travel to it returns
  *     exactly the model state recorded when it was current (or fails
  *     loud once expire dropped it);
  *   - [[IcebergImport.orphanFiles]] NEVER lists a live file of the
  *     current plan, after any op.
  *
  * `catalog = true` runs the SAME alphabet entirely THROUGH an
  * in-process REST catalog (loopback server): every commit — row-level,
  * refs, expiry, and all three maintenance ops — goes through
  * `CommitTableRequest`, every read resolves the catalog's
  * metadata-location handle, and the directory's version-hint goes
  * permanently STALE after the first commit by construction (the
  * catalog owns the pointer). On v3 this additionally model-checks the
  * row-lineage commit contract (first-row-id/added-rows advancing the
  * catalog's next-row-id) under arbitrary interleavings.
  *
  * Same confidence pattern as the graft-table LifecycleFuzzSpec, aimed
  * at the v2/v3 delete/sequence semantics that only composition
  * exercises (eq-delete over merged rows, compaction under stacked
  * tombstones, expire mid-history). */
class ForeignLifecycleFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def runFuzz(seed: Long, nOps: Int, v3: Boolean = false,
      catalog: Boolean = false): Unit = {
    val rnd = new scala.util.Random(seed)
    // bag model: key -> rows (appends may duplicate a key; merges and
    // key deletes collapse it)
    val model = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    // snapshot id -> the model state when that snapshot was current
    val states =
      scala.collection.mutable.Map.empty[Long, Seq[(Long, String)]]
    val init = (1L to 8L).map(i => (i, s"v$i-0"))
    model ++= init
    val loc =
      if (!v3) {
        val t = GraftTable(spark, tmpDir(s"ffuzz-$seed") + "/t")
        t.append(init.toDF("id", "v"))
        IcebergExport.export(spark, t, history = 2)
        t.location
      } else {
        // a NATIVE-shaped v3 fixture tree (next-row-id, first_row_id):
        // delete ops on it write DELETION VECTORS, so the whole
        // import / stream / changelog surface is model-checked under v3
        val l = tmpDir(s"ffuzz3-$seed") + "/t"
        new java.io.File(l).mkdirs()
        val f = ForeignFixtures.writeParquet(spark, l, "init",
          init.toDF("id", "v"))
        ForeignFixtures.writeTree(l, Seq(ForeignFixtures.schemaJson(0,
          Seq((1, "id", "long"), (2, "v", "string")))), 0, Seq.empty,
          Seq(ForeignFixtures.Snap(100L, None, 1L, "append",
            Seq(ForeignFixtures.Data(f, init.size.toLong, 1L)))),
          formatVersion = 3, lastColumnId = 2)
        l
      }
    var version = 1

    // ---- catalog routing: all commits through CommitTableRequest,
    // all reads through the catalog's metadata-location handle ----
    val ident = "lake.fuzz"
    val server: Option[graft.tools.LoopbackIcebergCatalog] =
      if (!catalog) None
      else {
        // the tree's own current metadata file, whatever its naming
        // family (vN for exports, native-prefixed for v3 fixtures)
        val (_, _, metaFile) = IcebergImport.parseMeta(spark, loc)
        Some(new graft.tools.LoopbackIcebergCatalog(ident,
          new java.io.File(metaFile.toUri.getPath).getAbsolutePath))
      }
    val base: Option[String] = server.map(_.start())
    val catArg: Option[(String, String)] = base.map(b => (b, ident))
    // the read/commit handle: catalog-resolved (pinned metadata file)
    // or the table root for the filesystem lifecycle
    def handle: String = base.map(b => graft.catalog.RestCatalog
      .loadTableMetadataLocation(b, ident)).getOrElse(loc)
    def doAppend(df: org.apache.spark.sql.DataFrame,
        branch: Option[String] = None): Long = base match {
      case Some(b) => IcebergWriteBack.appendToCatalog(spark, b, ident,
        df, branch = branch)
      case None => IcebergWriteBack.appendTo(spark, loc, df,
        branch = branch)
    }

    def freshVal(id: Long): String = { version += 1; s"v$id-$version" }
    def keys(n: Int): Seq[Long] =
      Seq.fill(n)(1L + rnd.nextInt(12).toLong).distinct

    def check(op: String): Unit = {
      val h = handle
      val got = IcebergImport.read(spark, h)
        .as[(Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
      val want = model.sortBy(r => (r._1, r._2)).toSeq
      assert(got === want, s"seed=$seed after $op")
      if (v3) {
        // v3 standing invariant: at most ONE live DV per data file
        // (the spec's merge-on-write rule), no position-delete FILES
        val p = IcebergImport.plan(spark, h)
        val multi = p.dvs.groupBy(_.dataFileUri).filter(_._2.size > 1)
        assert(multi.isEmpty,
          s"seed=$seed $op: multiple live DVs per file: ${multi.keys}")
        assert(p.deletes.forall(_.equalityCols.isDefined),
          s"seed=$seed $op: a position-delete FILE appeared on v3")
      }
      IcebergImport.currentSnapshotId(spark, h)
        .foreach(states(_) = want)
    }
    check("init")

    try {
    (1 to nOps).foreach { i =>
      rnd.nextInt(13) match {
        case 0 => // append (may duplicate keys — bag semantics)
          val rows = keys(1 + rnd.nextInt(3)).map(k => (k, freshVal(k)))
          doAppend(rows.toDF("id", "v"))
          model ++= rows
          check(s"op$i append $rows")
        case 1 => // position delete by predicate
          val cut = 1L + rnd.nextInt(12).toLong
          IcebergWriteBack.deleteWhere(spark, handle,
            col("id") === cut, catalog = catArg)
          model.filterInPlace(_._1 != cut)
          check(s"op$i deleteWhere id=$cut")
        case 2 => // equality delete by key set (no table scan)
          val ks = keys(1 + rnd.nextInt(3))
          IcebergWriteBack.deleteKeys(spark, handle, ks.toDF("id"),
            catalog = catArg)
          model.filterInPlace(r => !ks.contains(r._1))
          check(s"op$i deleteKeys $ks")
        case 3 | 4 => // keyed upsert — alternate both delete encodings
          val eq = rnd.nextBoolean()
          val src = keys(1 + rnd.nextInt(3)).map(k => (k, freshVal(k)))
          IcebergWriteBack.mergeInto(spark, handle,
            src.toDF("id", "v"), keys = Seq("id"), equalityDeletes = eq,
            catalog = catArg)
          val srcKeys = src.map(_._1).toSet
          model.filterInPlace(r => !srcKeys(r._1))
          model ++= src
          check(s"op$i merge(eq=$eq) $src")
        case 5 => // maintenance: binpack everything small (on v3 the
          // rewrite materializes row lineage into its outputs)
          IcebergWriteBack.compactSmallFiles(spark, handle,
            smallFileBytes = 64L << 20, catalog = catArg)
          check(s"op$i compact")
        case 6 => // maintenance: metadata-only expiry
          IcebergWriteBack.expireSnapshots(spark, handle, keepLast = 3,
            catalog = catArg)
          // ids no longer in the tree must fail loud on time travel;
          // drop them from the replayable set
          val live = IcebergImport.snapshots(spark, handle)
            .select("snapshot_id").as[Long].collect().toSet
          states.filterInPlace((id, _) => live(id))
          check(s"op$i expire")
        case 7 => // time travel: any remembered snapshot replays exactly
          if (states.nonEmpty) {
            val (sid, want) = {
              val ks = states.keys.toSeq.sorted
              val k = ks(rnd.nextInt(ks.size)); (k, states(k))
            }
            val got = IcebergImport.read(spark, handle,
              Some(sid.toString)).as[(Long, String)].collect()
              .sortBy(r => (r._1, r._2)).toSeq
            assert(got === want, s"seed=$seed op$i timeTravel $sid")
          }
        case 8 => // orphan listing never names a live file
          def norm(u: String): String = new java.net.URI(u).getPath
          val h = handle
          val live = IcebergImport.plan(spark, h).files
            .map(f => norm(f.uri)).toSet
          val listed = IcebergImport.orphanFiles(spark, h)
            .select("path").as[String].collect().map(norm).toSet
          assert(live.intersect(listed).isEmpty,
            s"seed=$seed op$i orphanFiles listed live files: " +
              live.intersect(listed))
        case 10 => // maintenance: manifest consolidation — metadata
          // only, the answer must be BYTE-identical afterwards (every
          // tombstone keeps applying at its explicit sequence number)
          IcebergWriteBack.rewriteManifests(spark, handle,
            catalog = catArg)
          check(s"op$i rewriteManifests")
        case 11 => // maintenance: position-tombstone consolidation —
          // v2 merges the accreted delete files (dangling positions
          // drop), v3 converts any legacy parquet tombstones to DVs;
          // either way the answer must be BYTE-identical (and check's
          // standing v3 invariants keep holding)
          IcebergWriteBack.rewritePositionDeletes(spark, handle,
            minInputFiles = 1, catalog = catArg)
          check(s"op$i rewritePositionDeletes")
        case 12 => // write-audit-publish: stage rows on a branch
          // (invisible to main — asserted), land via fast-forward,
          // drop the branch; the model gains the staged rows exactly
          // at the landing. Sequence numbers and v3 row-id space are
          // GLOBAL, so the staged commit must not disturb any other
          // invariant check runs later.
          val bname = s"wap$i"
          IcebergWriteBack.createRef(spark, handle, bname, "branch",
            catalog = catArg)
          val rows = keys(1 + rnd.nextInt(2)).map(k =>
            (k, freshVal(k)))
          doAppend(rows.toDF("id", "v"), branch = Some(bname))
          val mainNow = IcebergImport.read(spark, handle)
            .as[(Long, String)].collect().sortBy(r => (r._1, r._2))
          assert(mainNow.toSeq === model.sortBy(r => (r._1, r._2)).toSeq,
            s"seed=$seed op$i staged rows leaked into main")
          assert(IcebergImport.read(spark, handle, Some(bname)).count()
            == model.size + rows.size,
            s"seed=$seed op$i staged rows not readable at the ref")
          IcebergWriteBack.fastForward(spark, handle, "main", bname,
            catalog = catArg)
          IcebergWriteBack.dropRef(spark, handle, bname,
            catalog = catArg)
          model ++= rows
          check(s"op$i wap $rows")
        case 9 => // SQL register: the view pins the CURRENT state
          base match {
            case Some(b) => spark.sql(
              s"CALL graft.register_iceberg('$ident', " +
                s"name => 'ffuzz_reg_$seed', catalog_uri => '$b')")
            case None => spark.sql(
              s"CALL graft.register_iceberg('${loc}', " +
                s"name => 'ffuzz_reg_$seed')")
          }
          val got = spark.table(s"ffuzz_reg_$seed")
            .as[(Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
          assert(got === model.sortBy(r => (r._1, r._2)).toSeq,
            s"seed=$seed op$i register")
          spark.catalog.dropTempView(s"ffuzz_reg_$seed")
      }
    }

    // external cross-check: DuckDB hand-walks the finished tree — in
    // catalog mode through the EXACT metadata handle (the directory's
    // version-hint is stale by construction)
    val walkTarget = base.map(_ => handle).getOrElse(loc)
    val path = new java.net.URI("file://" + walkTarget).getPath
    val out = Seq("python3", "tools/read_iceberg_duckdb.py", path,
      "SELECT COUNT(*) AS n FROM t").!!
    assert(out.trim.split("\n").last === model.size.toString,
      s"seed=$seed duckdb row count")

    // streaming cross-check: the CDC source's batch 0 delivers the
    // final state as inserts — a replayed follower sees the model bag
    val q = spark.readStream.format("graft-iceberg")
      .option("mode", "cdc").load(walkTarget)
      .writeStream.format("memory").queryName(s"ffuzz_cdc_$seed")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table(s"ffuzz_cdc_$seed")
        .filter(col("_change_type") === "insert")
        .select("id", "v").as[(Long, String)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
      assert(streamed === model.sortBy(r => (r._1, r._2)).toSeq,
        s"seed=$seed cdc stream batch 0")
    } finally {
      q.stop()
      spark.catalog.dropTempView(s"ffuzz_cdc_$seed")
    }
    } finally server.foreach(_.stop())
  }

  test("seeded foreign-lifecycle fuzz: 20 ops, model-checked after " +
      "every op, DuckDB + CDC-stream cross-check at the end (seed 42)") {
    runFuzz(42L, 20)
  }

  test("seeded foreign-lifecycle fuzz (seed 1337)") {
    runFuzz(1337L, 20)
  }

  test("seeded foreign-lifecycle fuzz (seed 20260815)") {
    runFuzz(20260815L, 20)
  }

  test("seeded foreign-lifecycle fuzz, longer sequence (seed 7)") {
    runFuzz(7L, 30)
  }

  test("seeded foreign-lifecycle fuzz, widened alphabet (seed 12012)") {
    runFuzz(12012L, 25)
  }

  test("seeded foreign-lifecycle fuzz on a FORMAT-VERSION-3 tree: " +
      "delete ops write deletion vectors, one-live-DV-per-file " +
      "invariant after every op, DuckDB decodes the DVs (seed 30313)") {
    runFuzz(30313L, 25, v3 = true)
  }

  test("seeded foreign-lifecycle fuzz, v3 long sequence — repeated " +
      "DV supersede + lineage-preserving compaction interleavings " +
      "(seed 90210)") {
    runFuzz(90210L, 35, v3 = true)
  }

  test("seeded foreign-lifecycle fuzz THROUGH the REST catalog: every " +
      "commit (row-level, refs, expire, all three maintenance ops) via " +
      "CommitTableRequest, every read via the catalog handle, " +
      "version-hint stale by construction (seed 4242)") {
    runFuzz(4242L, 25, catalog = true)
  }

  test("seeded foreign-lifecycle fuzz, v3 THROUGH the REST catalog — " +
      "the row-lineage commit contract (first-row-id/added-rows vs " +
      "next-row-id) under arbitrary interleavings (seed 161616)") {
    runFuzz(161616L, 25, v3 = true, catalog = true)
  }
}

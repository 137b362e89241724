package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming TSV ingest: file source discovers + enriches batches") {
    val base = tmpDir("stream-ingest")
    val rawDir = s"$base/raw"; Files.createDirectories(Paths.get(rawDir))
    val schema = StructType(Seq(
      StructField("Op", StringType), StructField("invoiceid", LongType),
      StructField("price", DoubleType), StructField("quantity", IntegerType)))
    Files.write(Paths.get(rawDir, "b1.tsv"),
      "Op\tinvoiceid\tprice\tquantity\nI\t1\t5.0\t2\nI\t2\t-1.0\t2\nI\t3\t3.0\t1\n"
        .getBytes("UTF-8"))

    val q = Streaming.tsvIngestStream(spark, rawDir, schema)
      .writeStream.format("memory").queryName("bronze_stream")
      .option("checkpointLocation", s"$base/ckpt").start()
    try {
      q.processAllAvailable()
      val out = spark.sql("SELECT * FROM bronze_stream")
      assert(out.count() === 2) // price>0 && quantity>0 filter applied
      assert(out.columns.contains("processed_date")) // lineage columns added
      // incremental: second file only adds its own rows
      Files.write(Paths.get(rawDir, "b2.tsv"),
        "Op\tinvoiceid\tprice\tquantity\nU\t1\t9.0\t1\n".getBytes("UTF-8"))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM bronze_stream").count() === 3)
    } finally q.stop()
  }

  test("graftSink streams into a graft table exactly-once") {
    val base = tmpDir("stream-sink")
    val rawDir = s"$base/raw"; Files.createDirectories(Paths.get(rawDir))
    val tableLoc = s"$base/t"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    Files.write(Paths.get(rawDir, "b1.csv"), "id,v\n1,a\n2,b\n".getBytes("UTF-8"))

    val stream = spark.readStream.schema(schema)
      .option("header", "true").csv(rawDir)
    val q = Streaming.graftSink(stream, tableLoc, txnAppId = "sink-test")
      .option("checkpointLocation", s"$base/ckpt").start()
    try {
      q.processAllAvailable()
      val t = graft.table.GraftTable(spark, tableLoc)
      assert(t.read().count() === 2)
      // micro-batch commits carry the idempotent-writer stamp
      assert(t.lastTxnBatch("sink-test") === Some(0L))
      Files.write(Paths.get(rawDir, "b2.csv"), "id,v\n3,c\n".getBytes("UTF-8"))
      q.processAllAvailable()
      assert(t.read().count() === 3)
      assert(t.lastTxnBatch("sink-test") === Some(1L))
    } finally q.stop()

    // simulate the crash-replay: re-delivering an already-committed batch
    // (same appId + batchId) must be a NO-OP on the table
    val t = graft.table.GraftTable(spark, tableLoc)
    val before = t.latestSnapshotId.get
    val replayed = t.append(Seq((9L, "dup")).toDF("id", "v"),
      txn = Some(("sink-test", 1L)))
    assert(replayed === before) // no new snapshot
    assert(t.read().count() === 3) // no duplicate rows
    // a NEW batch id commits normally
    t.append(Seq((4L, "d")).toDF("id", "v"), txn = Some(("sink-test", 2L)))
    assert(t.read().count() === 4)
  }

  test("graftRollupSink: bronze append + gold maintenance per batch; " +
      "crash between the two layers and batch replay both recover " +
      "without double-counting") {
    val base = tmpDir("stream-rollup")
    val rawDir = s"$base/raw"; Files.createDirectories(Paths.get(rawDir))
    val bronzeLoc = s"$base/bronze"; val goldLoc = s"$base/gold"
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("v", LongType)))
    Files.write(Paths.get(rawDir, "b1.csv"),
      "g,v\na,1\na,2\nb,10\n".getBytes("UTF-8"))

    def goldRows() = graft.table.GraftTable(spark, goldLoc).read()
      .select("g", "v_sum", "n").orderBy("g")
      .as[(String, Long, Long)].collect().toSeq

    val stream = spark.readStream.schema(schema)
      .option("header", "true").csv(rawDir)
    var batches = 0
    val q = Streaming.graftRollupSink(stream, bronzeLoc, goldLoc,
      "roll-test", Seq("g"), Seq("v"),
      afterBatch = (_, _) => batches += 1)
      .option("checkpointLocation", s"$base/ckpt").start()
    try {
      q.processAllAvailable()
      assert(goldRows() === Seq(("a", 3L, 2L), ("b", 10L, 1L)))
      Files.write(Paths.get(rawDir, "b2.csv"),
        "g,v\na,5\nc,7\n".getBytes("UTF-8"))
      q.processAllAvailable()
      assert(goldRows() === Seq(("a", 8L, 3L), ("b", 10L, 1L),
        ("c", 7L, 1L)))
      assert(batches === 2)
    } finally q.stop()

    val bronze = graft.table.GraftTable(spark, bronzeLoc)
    val gold = graft.table.GraftTable(spark, goldLoc)

    // crash BETWEEN bronze append and gold maintain: batch 2 lands in
    // bronze only (the torn state a crash leaves) ...
    bronze.append(Seq(("b", 100L)).toDF("g", "v"),
      txn = Some(("roll-test", 2L)))
    // ... the stream restarts and REPLAYS batch 2: the bronze append is
    // a txn no-op, and the maintain reads bronze's changelog from gold's
    // own high-water mark — catching up the missed delta exactly once
    bronze.append(Seq(("b", 100L)).toDF("g", "v"),
      txn = Some(("roll-test", 2L))) // replayed append: no-op
    graft.pipeline.IncrementalRollup.maintain(bronze, gold, Seq("g"),
      Seq("v"), "roll-test-rollup")
    assert(goldRows() === Seq(("a", 8L, 3L), ("b", 110L, 2L),
      ("c", 7L, 1L)))
    // a full replay of the same batch (append + maintain) changes nothing
    bronze.append(Seq(("b", 100L)).toDF("g", "v"),
      txn = Some(("roll-test", 2L)))
    assert(graft.pipeline.IncrementalRollup.maintain(bronze, gold,
      Seq("g"), Seq("v"), "roll-test-rollup").isEmpty)
    assert(goldRows() === Seq(("a", 8L, 3L), ("b", 110L, 2L),
      ("c", 7L, 1L)))
  }

  test("graftMergeSink: per-batch window-dedup + keyed MOR merge; CDC " +
      "delete branch; crash-replay of a committed batch is a no-op") {
    val base = tmpDir("stream-merge")
    val rawDir = s"$base/raw"; Files.createDirectories(Paths.get(rawDir))
    val silverLoc = s"$base/silver"
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType),
      StructField("seq", LongType), StructField("op", StringType)))
    // batch 1: two versions of k=1 (dedup keeps latest by seq) + k=2
    Files.write(Paths.get(rawDir, "b1.csv"),
      "k,v,seq,op\n1,old,10,\n1,new,11,\n2,two,12,\n".getBytes("UTF-8"))

    def silverRows() = graft.table.GraftTable(spark, silverLoc).read()
      .select("k", "v", "seq").orderBy("k")
      .as[(Long, String, Long)].collect().toSeq

    val stream = spark.readStream.schema(schema)
      .option("header", "true").csv(rawDir)
    var batches = 0
    val q = Streaming.graftMergeSink(stream, silverLoc, "merge-test",
      keys = Seq("k"), dedupKey = Seq("k"), orderCol = "seq",
      opCol = Some("op"), afterBatch = _ => batches += 1)
      .option("checkpointLocation", s"$base/ckpt").start()
    try {
      q.processAllAvailable()
      assert(silverRows() === Seq((1L, "new", 11L), (2L, "two", 12L)))
      // batch 2: update k=1, CDC-delete k=2, insert k=3
      Files.write(Paths.get(rawDir, "b2.csv"),
        "k,v,seq,op\n1,upd,20,\n2,gone,21,D\n3,three,22,\n"
          .getBytes("UTF-8"))
      q.processAllAvailable()
      assert(silverRows() === Seq((1L, "upd", 20L), (3L, "three", 22L)))
      assert(batches === 2)
    } finally q.stop()

    val silver = graft.table.GraftTable(spark, silverLoc)
    // the op column never leaked into silver's schema
    assert(silver.schema.fieldNames.toSeq === Seq("k", "v", "seq"))
    // micro-batch merges carried the idempotent-writer stamp
    assert(silver.lastTxnBatch("merge-test") === Some(1L))
    // crash-replay: re-merging an already-committed batchId is a NO-OP
    val before = silver.latestSnapshotId.get
    silver.merge(Seq((9L, "dup", 99L, null.asInstanceOf[String]))
      .toDF("k", "v", "seq", "op"),
      keys = Seq("k"), dedupKey = Seq("k"), orderCol = "seq",
      opCol = Some("op"), mode = "mor", txn = Some(("merge-test", 1L)))
    assert(silver.latestSnapshotId.get === before)
    assert(silverRows() === Seq((1L, "upd", 20L), (3L, "three", 22L)))
    // a NEW batch id merges normally
    silver.merge(Seq((9L, "nine", 30L, null.asInstanceOf[String]))
      .toDF("k", "v", "seq", "op"),
      keys = Seq("k"), dedupKey = Seq("k"), orderCol = "seq",
      opCol = Some("op"), mode = "mor", txn = Some(("merge-test", 2L)))
    assert(silverRows() ===
      Seq((1L, "upd", 20L), (3L, "three", 22L), (9L, "nine", 30L)))
  }

  test("graftMedallionSink: bronze raw + silver merge + gold rollup per " +
      "batch; torn-state crash between ANY two layers recovers exactly " +
      "once on replay") {
    val base = tmpDir("stream-medallion")
    val rawDir = s"$base/raw"; Files.createDirectories(Paths.get(rawDir))
    val (bLoc, sLoc, gLoc) = (s"$base/bronze", s"$base/silver", s"$base/gold")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("g", StringType),
      StructField("v", LongType), StructField("seq", LongType),
      StructField("op", StringType)))
    Files.write(Paths.get(rawDir, "b1.csv"),
      "k,g,v,seq,op\n1,a,10,1,\n2,a,20,2,\n3,b,30,3,\n".getBytes("UTF-8"))

    def goldRows() = graft.table.GraftTable(spark, gLoc).read()
      .select("g", "v_sum", "n").orderBy("g")
      .as[(String, Long, Long)].collect().toSeq
    def silverRecompute() = graft.table.GraftTable(spark, sLoc).read()
      .groupBy("g").agg(sum(col("v")).as("v_sum"), count(lit(1)).as("n"))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq

    val stream = spark.readStream.schema(schema)
      .option("header", "true").csv(rawDir)
    val q = Streaming.graftMedallionSink(stream, bLoc, sLoc, gLoc,
      "med-test", keys = Seq("k"), dedupKey = Seq("k"), orderCol = "seq",
      rollupKeys = Seq("g"), sumCols = Seq("v"), opCol = Some("op"))
      .option("checkpointLocation", s"$base/ckpt").start()
    try {
      q.processAllAvailable()
      assert(goldRows() === Seq(("a", 30L, 2L), ("b", 30L, 1L)))
      // batch 2: update k=1, CDC-delete k=3, insert k=4
      Files.write(Paths.get(rawDir, "b2.csv"),
        "k,g,v,seq,op\n1,a,100,4,\n3,b,0,5,D\n4,b,7,6,\n".getBytes("UTF-8"))
      q.processAllAvailable()
      assert(goldRows() === Seq(("a", 120L, 2L), ("b", 7L, 1L)))
      assert(goldRows() === silverRecompute())
    } finally q.stop()

    val bronze = graft.table.GraftTable(spark, bLoc)
    val silver = graft.table.GraftTable(spark, sLoc)
    val gold = graft.table.GraftTable(spark, gLoc)
    assert(bronze.read().count() === 6) // RAW history incl. the delete row

    // torn state: batch 2 "crashed" after silver but BEFORE gold would
    // have caught a later delta — simulate a batch 3 that reaches bronze
    // and silver only
    val b3 = Seq((5L, "a", 50L, 7L, null.asInstanceOf[String]))
      .toDF("k", "g", "v", "seq", "op")
    bronze.append(b3, txn = Some(("med-test", 2L)))
    silver.merge(b3, keys = Seq("k"), dedupKey = Seq("k"),
      orderCol = "seq", opCol = Some("op"), mode = "mor",
      txn = Some(("med-test", 2L)))
    // gold is now BEHIND silver ...
    assert(goldRows() !== silverRecompute())
    // ... the stream restarts and REPLAYS batch 3 through all layers:
    // bronze + silver no-op on their stamps, gold catches up exactly
    bronze.append(b3, txn = Some(("med-test", 2L)))
    silver.merge(b3, keys = Seq("k"), dedupKey = Seq("k"),
      orderCol = "seq", opCol = Some("op"), mode = "mor",
      txn = Some(("med-test", 2L)))
    graft.pipeline.IncrementalRollup.maintain(silver, gold, Seq("g"),
      Seq("v"), "med-test-gold")
    assert(bronze.read().count() === 7) // no duplicate raw rows
    assert(goldRows() === silverRecompute())
    assert(goldRows() === Seq(("a", 170L, 3L), ("b", 7L, 1L)))
    // a full second replay changes nothing anywhere
    bronze.append(b3, txn = Some(("med-test", 2L)))
    silver.merge(b3, keys = Seq("k"), dedupKey = Seq("k"),
      orderCol = "seq", opCol = Some("op"), mode = "mor",
      txn = Some(("med-test", 2L)))
    assert(graft.pipeline.IncrementalRollup.maintain(silver, gold,
      Seq("g"), Seq("v"), "med-test-gold").isEmpty)
    assert(bronze.read().count() === 7)
    assert(goldRows() === Seq(("a", 170L, 3L), ("b", 7L, 1L)))
  }

  test("streaming dedup keeps first occurrence across micro-batches") {
    val base = tmpDir("stream-dedup")
    val rawDir = s"$base/raw"; Files.createDirectories(Paths.get(rawDir))
    val tableLoc = s"$base/t"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    // b1 carries an in-batch duplicate (ids 1/2 same normalized content)
    Files.write(Paths.get(rawDir, "b1.csv"),
      "id|text\n1|hello world\n2|HELLO   world\n3|other doc\n"
        .getBytes("UTF-8"))
    val stream = spark.readStream.schema(schema)
      .option("header", "true").option("sep", "|").csv(rawDir)
    val q = Streaming.graftSink(
      Streaming.dedupStream(stream, "text"), tableLoc,
      txnAppId = "dedup-test")
      .option("checkpointLocation", s"$base/ckpt").start()
    try {
      q.processAllAvailable()
      val t = graft.table.GraftTable(spark, tableLoc)
      assert(t.read().count() === 2) // in-batch dup collapsed
      // b2: one cross-batch duplicate (vs b1) + one genuinely new doc
      Files.write(Paths.get(rawDir, "b2.csv"),
        "id|text\n4|hello WORLD\n5|brand new\n".getBytes("UTF-8"))
      q.processAllAvailable()
      val rows = t.read().select("id").as[Long].collect().sorted
      assert(rows.length === 3, s"got ${rows.mkString(",")}")
      assert(rows.contains(5L) && !rows.contains(4L),
        "cross-batch duplicate must be dropped by checkpointed state")
    } finally q.stop()
  }

  test("watermarked dedup evicts state but still drops in-window dups, " +
      "and fp stays out of the output schema") {
    val base = tmpDir("stream-dedup-wm")
    val rawDir = s"$base/raw"; Files.createDirectories(Paths.get(rawDir))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("ets", StringType),
      StructField("text", StringType)))
    // duplicate (ids 1/2) within the watermark window; id 3 distinct
    Files.write(Paths.get(rawDir, "b1.csv"),
      ("id|ets|text\n1|2024-01-01 00:00:10|same doc\n" +
        "2|2024-01-01 00:00:20|SAME   doc\n" +
        "3|2024-01-01 00:00:30|other doc\n").getBytes("UTF-8"))
    val stream = spark.readStream.schema(schema)
      .option("header", "true").option("sep", "|").csv(rawDir)
      .withColumn("ets", col("ets").cast("timestamp"))
    val out = Streaming.dedupStream(stream, "text",
      eventTimeCol = Some("ets"), lateness = "10 minutes")
    assert(!out.columns.contains("fp"), "internal fp column must not leak")
    val q = out.writeStream.format("memory").queryName("wm_dedup")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt").start()
    try {
      q.processAllAvailable()
      val ids = spark.table("wm_dedup").select("id").as[Long]
        .collect().sorted
      assert(ids.length === 2, s"got ${ids.mkString(",")}")
      assert(ids.contains(3L) && !(ids.contains(1L) && ids.contains(2L)))
    } finally q.stop()
  }

  test("watermarked windowed aggregation over an event stream") {
    val base = tmpDir("stream-window")
    val src = s"$base/src"
    val events = Seq(
      ("2024-01-01 00:00:10", "click", 1.0),
      ("2024-01-01 00:00:50", "click", 2.0),
      ("2024-01-01 00:05:10", "view", 3.0),
      ("2024-01-01 00:05:20", "click", 4.0))
      .toDF("ts_s", "event_type", "value")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    events.write.parquet(src)

    val stream = spark.readStream.schema(events.schema).parquet(src)
    val agg = Streaming.windowedCounts(stream, "ts", "5 minutes", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("win_stream")
      .outputMode("complete")
      .option("checkpointLocation", s"$base/ckpt").start()
    try {
      q.processAllAvailable()
      val out = spark.sql(
        "SELECT window.start, event_type, n, total_value FROM win_stream")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      assert(out === Set(
        ("2024-01-01 00:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 00:05:00.0", "view", 1L, 3.0),
        ("2024-01-01 00:05:00.0", "click", 1L, 4.0)))
    } finally q.stop()
  }

  test("stateful sessionization agrees with the batch window formulation") {
    val base = tmpDir("stream-sess")
    val src = s"$base/src"
    val gapUs = 30L * 60 * 1000000
    // user 1: two sessions (90-minute gap); user 2: one session
    val events = Seq(
      Streaming.Event(1L, 0L, 1.0),
      Streaming.Event(1L, 10L * 60 * 1000000, 2.0),
      Streaming.Event(1L, 100L * 60 * 1000000, 3.0),
      Streaming.Event(2L, 0L, 4.0))
    events.toDF().write.parquet(src)

    val stream = spark.readStream
      .schema(events.toDF().schema).parquet(src)
      .as[Streaming.Event]
    val q = Streaming.sessionize(stream, gapUs)
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt").start()
    try {
      q.processAllAvailable()
      // closed sessions emitted so far: user 1's first session
      val closed = spark.sql("SELECT * FROM sess_stream").collect()
      assert(closed.length === 1)
      assert(closed(0).getAs[Long]("user_id") === 1L)
      assert(closed(0).getAs[Int]("n_events") === 2)
      assert(closed(0).getAs[Double]("total_value") === 3.0)
    } finally q.stop()

    // batch view: total sessions = closed + open = 3
    val batch = Streaming.allSessions(events.toDF().as[Streaming.Event], gapUs)
    assert(batch.count() === 3)
    assert(batch.filter($"user_id" === 1L).count() === 2)
  }

  test("graft streaming source: full state, then appends, exactly once") {
    import graft.table.GraftTable
    val base = tmpDir("stream-src")
    val t = GraftTable(spark, s"$base/t")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))

    val q = spark.readStream.format("graft").load(t.location)
      .writeStream.format("memory").queryName("graft_src_basic")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt").start()
    try {
      q.processAllAvailable()
      // batch 0 = full current state
      assert(spark.sql("SELECT id FROM graft_src_basic").as[Long]
        .collect().sorted === Array(1L, 2L))
      // later appends flow incrementally, no re-delivery
      t.append(Seq((3L, "c")).toDF("id", "v"))
      t.append(Seq((4L, "d")).toDF("id", "v"))
      q.processAllAvailable()
      assert(spark.sql("SELECT id FROM graft_src_basic").as[Long]
        .collect().sorted === Array(1L, 2L, 3L, 4L))
      // no new snapshot → no new rows
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM graft_src_basic")
        .as[Long].collect()(0) === 4L)
    } finally q.stop()
    spark.catalog.dropTempView("graft_src_basic")
  }

  test("graft streaming source survives kill + restart from checkpoint exactly-once") {
    import graft.table.GraftTable
    val base = tmpDir("stream-src-restart")
    val src = GraftTable(spark, s"$base/src")
    val outLoc = s"$base/out"
    src.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))

    def startQuery() = Streaming.graftSink(
      spark.readStream.format("graft").load(src.location),
      outLoc, txnAppId = "restart-spec")
      .option("checkpointLocation", s"$base/ckpt").start()

    // run 1: initial state + one incremental append, then KILL the query
    val q1 = startQuery()
    try {
      q1.processAllAvailable()
      src.append(Seq((3L, "c")).toDF("id", "v"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(GraftTable(spark, outLoc).read().select("id").as[Long]
      .collect().sorted === Array(1L, 2L, 3L))

    // while the stream is DOWN, the table keeps committing
    src.append(Seq((4L, "d")).toDF("id", "v"))
    src.append(Seq((5L, "e")).toDF("id", "v"))

    // run 2: a NEW query resumes from the checkpoint — the snapshots
    // appended during the outage arrive once; nothing re-delivers
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      src.append(Seq((6L, "f")).toDF("id", "v")) // and the stream goes on
      q2.processAllAvailable()
    } finally q2.stop()
    val out = GraftTable(spark, outLoc).read().select("id").as[Long]
      .collect().sorted
    assert(out === Array(1L, 2L, 3L, 4L, 5L, 6L)) // no dupes, no gaps
  }

  test("graft streaming source: mid-stream evolve keeps the declared schema") {
    import graft.table.GraftTable
    val base = tmpDir("stream-src-evolve")
    val t = GraftTable(spark, s"$base/t")
    t.append(Seq((1L, "a")).toDF("id", "v"))

    val q = spark.readStream.format("graft").load(t.location)
      .writeStream.format("memory").queryName("graft_src_evolve")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt").start()
    try {
      q.processAllAvailable()
      // a zero-file evolve + an append carrying the new column: the
      // stream keeps delivering under its DECLARED (stream-start)
      // schema — the new column is not delivered until restart, and the
      // evolve snapshot is not treated as a rewrite
      t.addColumns(Seq(org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType)))
      t.append(Seq((2L, "b", 0.5)).toDF("id", "v", "score"))
      q.processAllAvailable()
      assert(q.exception.isEmpty)
      val out = spark.table("graft_src_evolve")
      assert(out.columns.toSeq === Seq("id", "v"))
      assert(out.select("id").as[Long].collect().sorted === Array(1L, 2L))
    } finally q.stop()
    spark.catalog.dropTempView("graft_src_evolve")

    // a RESTARTED stream picks the evolved schema up (fresh full state)
    val q2 = spark.readStream.format("graft").load(t.location)
      .writeStream.format("memory").queryName("graft_src_evolve2")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt2").start()
    try {
      q2.processAllAvailable()
      val out2 = spark.table("graft_src_evolve2")
      assert(out2.columns.toSeq === Seq("id", "v", "score"))
      assert(out2.count() === 2)
    } finally q2.stop()
    spark.catalog.dropTempView("graft_src_evolve2")
  }

  test("graft streaming source: rewrites fail the stream unless skipped") {
    import graft.table.GraftTable
    val base = tmpDir("stream-src-rw")
    val t = GraftTable(spark, s"$base/t")
    t.append(Seq((1L, "a", 1L)).toDF("id", "v", "ts"))

    // default: a merge inside the uncommitted range kills the stream
    val qFail = spark.readStream.format("graft").load(t.location)
      .writeStream.format("memory").queryName("graft_src_fail")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt-fail").start()
    try {
      qFail.processAllAvailable()
      t.merge(Seq((1L, "a2", 2L)).toDF("id", "v", "ts"),
        keys = Seq("id"), dedupKey = Seq("id"), orderCol = "ts")
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        qFail.processAllAvailable()
        throw qFail.exception.getOrElse(
          fail("stream should have failed crossing a rewrite"))
      }
    } finally qFail.stop()
    spark.catalog.dropTempView("graft_src_fail")

    // skipRewrites: stream starts AFTER the merge (full state includes
    // it), skips later rewrites, keeps delivering appends
    val qSkip = spark.readStream.format("graft")
      .option("skipRewrites", "true").load(t.location)
      .writeStream.format("memory").queryName("graft_src_skip")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt-skip").start()
    try {
      qSkip.processAllAvailable()
      assert(spark.sql("SELECT v FROM graft_src_skip").as[String]
        .collect() === Array("a2")) // merged state delivered as batch 0
      t.compact(filesPerPartition = 1) // rewrite: skipped, not fatal
      t.append(Seq((5L, "e", 3L)).toDF("id", "v", "ts"))
      qSkip.processAllAvailable()
      assert(spark.sql("SELECT v FROM graft_src_skip ORDER BY id")
        .as[String].collect() === Array("a2", "e"))
    } finally qSkip.stop()
    spark.catalog.dropTempView("graft_src_skip")
  }

  test("foreign Iceberg streaming source: full state, then append " +
      "deltas, checkpoint-exact restart, non-append commit fails loud") {
    import graft.table.GraftTable
    import graft.iceberg.IcebergExport
    val base = tmpDir("stream-ice")
    val t = GraftTable(spark, s"$base/t")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    IcebergExport.export(spark, t, history = 8)

    def startQuery() = Streaming.graftSink(
      spark.readStream.format("graft-iceberg").load(t.location),
      s"$base/out", txnAppId = "ice-stream-spec")
      .option("checkpointLocation", s"$base/ckpt").start()

    val q1 = startQuery()
    try {
      q1.processAllAvailable() // batch 0: full state at current snapshot
      assert(GraftTable(spark, s"$base/out").read().select("id").as[Long]
        .collect().sorted === Array(1L, 2L))
      // the foreign writer appends + re-exports; the delta flows
      t.append(Seq((3L, "c")).toDF("id", "v"))
      IcebergExport.export(spark, t, history = 8)
      q1.processAllAvailable()
      assert(GraftTable(spark, s"$base/out").read().select("id").as[Long]
        .collect().sorted === Array(1L, 2L, 3L))
      // idle tick: no new snapshot, no new rows
      q1.processAllAvailable()
      assert(GraftTable(spark, s"$base/out").read().count() === 3L)
    } finally q1.stop()

    // two appends while the stream is down → one exactly-once catch-up
    t.append(Seq((4L, "d")).toDF("id", "v"))
    t.append(Seq((5L, "e")).toDF("id", "v"))
    IcebergExport.export(spark, t, history = 8)
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      assert(GraftTable(spark, s"$base/out").read().select("id").as[Long]
        .collect().sorted === Array(1L, 2L, 3L, 4L, 5L))

      // a non-append foreign commit (merge → overwrite) fails the stream
      t.merge(Seq((1L, "zz")).toDF("id", "v"), keys = Seq("id"),
        dedupKey = Seq("id"), orderCol = "id")
      IcebergExport.export(spark, t, history = 8)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(e.getMessage.contains("non-append"))
    } finally q2.stop()
  }

  test("foreign Iceberg streaming source with skipRewrites rides " +
      "through a mid-stream compaction exactly-once") {
    import graft.table.GraftTable
    import graft.iceberg.IcebergExport
    val base = tmpDir("stream-ice-skip")
    val t = GraftTable(spark, s"$base/t")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    IcebergExport.export(spark, t, history = 10)
    val q = Streaming.graftSink(
      spark.readStream.format("graft-iceberg")
        .option("skipRewrites", "true").load(t.location),
      s"$base/out", txnAppId = "ice-skip-spec")
      .option("checkpointLocation", s"$base/ckpt").start()
    try {
      q.processAllAvailable()
      // append → compact → append, all inside ONE uncommitted range
      t.append(Seq((3L, "c")).toDF("id", "v"))
      t.compact(filesPerPartition = 1)
      t.append(Seq((4L, "d")).toDF("id", "v"))
      IcebergExport.export(spark, t, history = 10)
      q.processAllAvailable()
      // both appends once each; the compaction's rewritten copies never
      assert(GraftTable(spark, s"$base/out").read().select("id").as[Long]
        .collect().sorted === Array(1L, 2L, 3L, 4L))
    } finally q.stop()
  }

  test("foreign Iceberg streaming CDC mode: merges/deletes flow as " +
      "per-commit change rows instead of failing; restart catch-up " +
      "exactly-once") {
    import graft.table.GraftTable
    import graft.iceberg.IcebergExport
    val base = tmpDir("stream-ice-cdc")
    val t = GraftTable(spark, s"$base/t")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    IcebergExport.export(spark, t, history = 14)
    val sBase = t.latestSnapshotId.get
    def start() = Streaming.graftSink(
      spark.readStream.format("graft-iceberg")
        .option("mode", "cdc").load(t.location),
      s"$base/out", txnAppId = "ice-cdc-spec")
      .option("checkpointLocation", s"$base/ckpt").start()
    def out() = GraftTable(spark, s"$base/out").read()
    val q = start()
    try {
      q.processAllAvailable()
      assert(out().count() === 2)
      assert(out().select("_change_type").distinct().as[String]
        .collect().toSeq === Seq("insert"))
      // the foreign writer merges, deletes AND appends — the append-mode
      // stream would fail here; CDC delivers all three as change rows
      t.merge(Seq((1L, "zz")).toDF("id", "v"), keys = Seq("id"),
        dedupKey = Seq("id"), orderCol = "id") // ord 0: update pair
      t.deletePositions($"id" === 2L) // ord 1: delete
      t.append(Seq((3L, "c")).toDF("id", "v")) // ord 2: insert, no diff
      IcebergExport.export(spark, t, history = 14)
      q.processAllAvailable()
      val post = out()
        .filter($"_commit_snapshot_id" =!= sBase)
        .select("id", "v", "_change_type", "_change_ordinal")
        .as[(Long, String, String, Int)].collect()
        .sortBy(r => (r._4, r._3, r._1)).toSeq
      assert(post === Seq(
        (1L, "a", "delete", 0), (1L, "zz", "insert", 0),
        (2L, "b", "delete", 1),
        (3L, "c", "insert", 2)))
      // idle tick delivers nothing
      q.processAllAvailable()
      assert(out().count() === 6)
    } finally q.stop()

    // change committed while the stream is DOWN → restart delivers the
    // catch-up diff exactly once from the checkpointed offset
    t.merge(Seq((3L, "C")).toDF("id", "v"), keys = Seq("id"),
      dedupKey = Seq("id"), orderCol = "id")
    IcebergExport.export(spark, t, history = 14)
    val q2 = start()
    try {
      q2.processAllAvailable()
      // checkpointed offsets: the restarted query delivers ONLY the
      // missed range, as exactly its diff pair — total 6 + 2
      assert(out().count() === 8)
      assert(out().filter($"id" === 3L)
        .select("v", "_change_type").as[(String, String)].collect()
        .sortBy(r => (r._2, r._1)).toSeq ===
        Seq(("c", "delete"), ("C", "insert"), ("c", "insert")))
    } finally q2.stop()
  }

  test("foreign Iceberg streaming source: NON-MONOTONIC foreign " +
      "snapshot ids (random-id engines) deliver every batch — ordering " +
      "comes from the ancestry walk, not numeric comparison") {
    import graft.iceberg.ForeignFixtures
    import graft.iceberg.ForeignFixtures.{Data, Snap}
    import graft.table.GraftTable
    val base = tmpDir("stream-ice-randid")
    val loc = s"$base/t"
    new java.io.File(loc).mkdirs()
    val schema = ForeignFixtures.schemaJson(0,
      Seq((1, "id", "long"), (2, "v", "string")))
    val f1 = ForeignFixtures.writeParquet(spark, loc, "F1",
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // the foreign engine's FIRST commit draws a LARGE random id
    val s900 = Snap(900L, None, 1L, "append", Seq(Data(f1, 2, 1L)))
    ForeignFixtures.writeTree(loc, Seq(schema), 0, Seq.empty,
      Seq(s900), version = 1, lastColumnId = 2)

    val q = Streaming.graftSink(
      spark.readStream.format("graft-iceberg").load(loc),
      s"$base/out", txnAppId = "ice-randid-spec")
      .option("checkpointLocation", s"$base/ckpt").start()
    try {
      q.processAllAvailable() // batch 0 pins offset 900
      assert(GraftTable(spark, s"$base/out").read().select("id").as[Long]
        .collect().sorted === Array(1L, 2L))
      // the next commit draws a SMALLER id (100 < 900): a numeric
      // startId >= endId short-circuit would commit an EMPTY batch here
      // and the range's rows would be silently lost forever
      val f2 = ForeignFixtures.writeParquet(spark, loc, "F2",
        Seq((3L, "c")).toDF("id", "v"))
      val s100 = Snap(100L, Some(900L), 2L, "append",
        Seq(Data(f1, 2, 1L), Data(f2, 1, 2L)))
      ForeignFixtures.writeTree(loc, Seq(schema), 0, Seq.empty,
        Seq(s900, s100), version = 2, lastColumnId = 2)
      q.processAllAvailable()
      assert(GraftTable(spark, s"$base/out").read().select("id").as[Long]
        .collect().sorted === Array(1L, 2L, 3L))
      // and a third commit smaller still (ids keep going "backwards")
      val f3 = ForeignFixtures.writeParquet(spark, loc, "F3",
        Seq((4L, "d")).toDF("id", "v"))
      val s50 = Snap(50L, Some(100L), 3L, "append",
        Seq(Data(f1, 2, 1L), Data(f2, 1, 2L), Data(f3, 1, 3L)))
      ForeignFixtures.writeTree(loc, Seq(schema), 0, Seq.empty,
        Seq(s900, s100, s50), version = 3, lastColumnId = 2)
      q.processAllAvailable()
      assert(GraftTable(spark, s"$base/out").read().select("id").as[Long]
        .collect().sorted === Array(1L, 2L, 3L, 4L))
    } finally q.stop()
  }
}

package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Job-level watermark checkpoint — the reference's JSON checkpoint files
  * ({last_processed_time}, /root/reference/raw-bronze.py:36-53,87-99;
  * {last_processed_snapshot}, /root/reference/bronze-silver.py:75-109).
  *
  * Fixes two reference bugs noted in SURVEY.md §2:
  *   N2 — we checkpoint max(mtime of processed files), not commit wall-time,
  *        so files that land mid-run are picked up next run;
  *   N3 — load/save work symmetrically for any Hadoop-supported scheme
  *        (the reference's silver save is S3-only and silently no-ops
  *        locally).
  */
class Checkpoint(spark: SparkSession, location: String) {
  private val path = new Path(location)
  private def fs: FileSystem =
    path.getFileSystem(spark.sessionState.newHadoopConf())

  def load(key: String): Option[Long] = {
    if (!fs.exists(path)) return None
    val in = fs.open(path)
    try {
      val len = fs.getFileStatus(path).getLen.toInt
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      val s = new String(bytes, "UTF-8")
      val m = ("\"" + key + "\"\\s*:\\s*(-?\\d+)").r
      m.findFirstMatchIn(s).map(_.group(1).toLong)
    } finally in.close()
  }

  /** Commit AFTER a successful load, as the reference orders it
    * (/root/reference/raw-bronze.py:249-253). Atomic via temp + rename. */
  def save(key: String, value: Long): Unit = {
    val tmp = new Path(path.getParent,
      s".${path.getName}.tmp-${java.util.UUID.randomUUID()}")
    fs.mkdirs(path.getParent)
    val out = fs.create(tmp, true)
    try out.write(s"""{"$key": $value}""".getBytes("UTF-8")) finally out.close()
    if (fs.exists(path)) fs.delete(path, false)
    if (!fs.rename(tmp, path))
      throw new IllegalStateException(s"checkpoint commit failed: $location")
  }
}

/** S1–S3: checkpointed discovery of newly arrived raw files. The reference
  * lists a prefix and keeps files with mtime > checkpoint
  * (/root/reference/raw-bronze.py:59-85); the Hadoop FileSystem API gives us
  * the same over file://, hdfs://, or s3a:// with one code path.
  *
  * Scale note: listing is driver-side metadata (as in the reference); at
  * production scale the same contract is served by Structured Streaming's
  * file source (see graft.streaming), which tracks seen-files in a
  * fault-tolerant checkpoint instead of an mtime watermark.
  */
class IncrementalFileSource(spark: SparkSession, dir: String,
    suffix: String = ".tsv") {
  private val dirPath = new Path(dir)
  private def fs: FileSystem =
    dirPath.getFileSystem(spark.sessionState.newHadoopConf())

  /** (paths, maxMtime) of files newer than `afterMtime`. */
  def newFiles(afterMtime: Long): (Seq[String], Long) = {
    if (!fs.exists(dirPath)) return (Seq.empty, afterMtime)
    val it = fs.listFiles(dirPath, true)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(suffix) &&
          f.getModificationTime > afterMtime)
        out += ((f.getPath.toString, f.getModificationTime))
    }
    val sorted = out.sortBy(_._1)
    (sorted.map(_._1).toSeq,
      if (out.isEmpty) afterMtime else out.map(_._2).max)
  }
}

/** S4: TSV batch scan with header + schema inference — the reference's
  * `spark.read.csv(files, sep='\t', header=True, inferSchema=True)`
  * (/root/reference/raw-bronze.py:117-128). */
object TsvReader {
  def read(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(paths: _*)
}

/** P1–P5: the ingest enrichment — star projection plus lineage columns
  * (input_file, processed_time, processed_date) and the conjunctive
  * numeric quality filter, exactly the reference's SQL
  * (/root/reference/raw-bronze.py:207-217). Expressed as a declarative
  * projection so Catalyst pushes the filter into the CSV scan. */
object Enrich {
  import org.apache.spark.sql.functions._

  def apply(df: DataFrame): DataFrame =
    df.withColumn("input_file", input_file_name())
      .withColumn("processed_time", current_timestamp())
      .withColumn("processed_date",
        date_format(current_timestamp(), "yyyy-MM-dd"))
      .filter(col("price") > 0 && col("quantity") > 0)
}

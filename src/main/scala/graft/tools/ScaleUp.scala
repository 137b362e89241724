package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale-up of a driver testdata directory (sf0.1 → "sf1") for the
  * scale tier of the bench: the heavy operators' runtime curve is
  * measured against a corpus an order of magnitude larger than the
  * correctness gate's, pinning the claimed linear designs.
  *
  * Replication preserves workload SHAPE, not just row count:
  *   - orders/lineitem: each copy shifts the order keys by a disjoint
  *     range (copy i adds i × (max+1)), so modular slice filters select
  *     proportionally and the orders↔lineitem join keys stay consistent;
  *   - documents: copy i suffixes every token with `xi`, making each
  *     copy a self-contained corpus — near-duplicate structure per copy
  *     is identical to the original and never bleeds across copies, so
  *     candidate-pair volume scales linearly (what a 10× real corpus
  *     does), instead of quadratically (what naive row duplication does);
  *   - embeddings: ids shift per copy; vectors are unchanged (bucketing
  *     and probe cost depend on geometry, which stays realistic);
  *   - events: event/user ids shift per copy (10× users, same per-user
  *     activity profile);
  *   - dimension tables copy through unchanged.
  *
  * Output is written once to `outDir` and reused; delete the directory
  * to regenerate.
  */
object ScaleUp {

  val Copies = 10

  def ensure(spark: SparkSession, srcDir: String, outDir: String): String = {
    // events carries nanos timestamps; generation must not depend on a
    // query having set this session conf first (it now runs BEFORE the
    // timed pass, so nothing else has)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val done = new Path(outDir, "_SCALE_READY")
    val fs = done.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(done)) return outDir
    generate(spark, srcDir, outDir)
    fs.create(done, true).close()
    outDir
  }

  private def replicate(df: DataFrame)(copy: (DataFrame, Int) => DataFrame)
      : DataFrame =
    (0 until Copies).map(i => copy(df, i)).reduce(_ unionByName _)

  def generate(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    def read(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    // dimensions pass through
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => write(read(t), t))

    val orders = read("orders")
    val orderSpan = orders.agg(max("o_orderkey")).head().getLong(0) + 1
    write(replicate(orders)((df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * orderSpan))),
      "orders")

    val lineitem = read("lineitem")
    write(replicate(lineitem)((df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * orderSpan))),
      "lineitem")

    val docs = read("documents")
    val docSpan = docs.agg(max("doc_id")).head().getLong(0) + 1
    write(replicate(docs)((df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * docSpan))
        .withColumn("text",
          regexp_replace(col("text"), "(\\S+)", "$1x" + i))),
      "documents")

    val emb = read("embeddings")
    val vecSpan = emb.agg(max("vec_id")).head().getLong(0) + 1
    write(replicate(emb)((df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * vecSpan))),
      "embeddings")

    val events = read("events")
    val evSpan = events.agg(max("event_id")).head().getLong(0) + 1
    val userSpan = events.agg(max("user_id")).head().getLong(0) + 1
    write(replicate(events)((df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * evSpan))
        .withColumn("user_id", col("user_id") + lit(i * userSpan))),
      "events")
  }
}

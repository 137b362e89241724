package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force top-k by exact (quantized) cosine — a broadcast of
  * the query set against a single scan of the corpus; correct by
  * construction, O(corpus × queries).
  *
  * Scale path: hyperplane-LSH bucketing — corpus and queries are hashed
  * into sign-pattern buckets by fixed Rademacher hyperplanes; each query
  * only scores candidates in buckets within `probeDist` Hamming distance of
  * its own bucket (multi-probe). Corpus bucketing is a one-time map pass;
  * the join is bucket-co-partitioned, so at 100 TB each query touches a
  * small fraction of the corpus instead of all of it. Recall is tunable via
  * (nPlanes, probeDist); the ScalaTest pins recall ≥ 0.9 vs brute force at
  * k=10.
  */
object SimilaritySearch {

  /** Exact top-k neighbors for each query row, by quantized cosine
    * (deterministic cross-engine), ties broken by neighbor id.
    * Output: (query_id, neighbor_id, rank, cos).
    *
    * Ranking uses the bounded-heap [[graft.functions.AggExpressions.TopKAgg]]
    * aggregate, NOT a row_number window: partial aggregation reduces every
    * map task to at most k pairs per query before the exchange, so the
    * shuffle moves O(k × partitions × queries) rows — a window would
    * shuffle the ENTIRE scored corpus (corpus × queries rows) just to
    * rank it, the difference between megabytes and the full dataset at
    * 100 TB. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      quantize(col(vecCol)).as("q_c"))
    val q = queries.select(col(idCol).as("query_id"),
      quantize(col(vecCol)).as("q_q"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosineQ(col("q_q"), col("q_c")))
    scored.groupBy("query_id")
      .agg(graft.functions.AggExpressions
        .topk_by(col("neighbor_id"), col("cos"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"), col("col.cos"))
  }

  /** Candidate pairs from multi-table hyperplane LSH with single-bit
    * multi-probe on the query side.
    *
    * Corpus rows are exploded to `nTables` (table, bucket) keys — the
    * classic L-hash-tables memory/recall tradeoff; queries additionally
    * probe every bucket within Hamming distance 1 of their own
    * (planesPerTable+1 probes per table). The join is a plain equi-join on
    * (table, bucket): co-partitioned, no broadcast of the corpus, no
    * all-pairs product — the shape that holds at 100 TB. */
  def lshCandidates(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, nTables: Int, planesPerTable: Int,
      probe: Boolean = true): DataFrame = {
    def buckets(df: DataFrame, out: String): DataFrame =
      df.select(col(idCol).as(out), quantize(col(vecCol)).as(s"q_$out"),
        array((0 until nTables).map(t =>
          hyperplaneBucket(col(vecCol), planesPerTable, seed = 7 + t)): _*)
          .as("bks"))

    val c = buckets(corpus, "neighbor_id")
      .select(col("neighbor_id"), col("q_neighbor_id"),
        explode(array((0 until nTables).map(t =>
          struct(lit(t).as("t"), col("bks")(t).as("bk"))): _*)).as("tb"))
      .select(col("neighbor_id"), col("q_neighbor_id"),
        col("tb.t"), col("tb.bk"))

    // query side: emit the bucket itself plus all 1-bit perturbations
    val probes = (t: Int) => {
      val base = col("bks")(t)
      val perturbed =
        if (probe) (0 until planesPerTable).map(b =>
          struct(lit(t).as("t"),
            base.bitwiseXOR(lit(1L << b)).as("bk")))
        else Seq.empty
      struct(lit(t).as("t"), base.as("bk")) +: perturbed
    }
    val q = buckets(queries, "query_id")
      .select(col("query_id"), col("q_query_id"),
        explode(array((0 until nTables).flatMap(probes): _*)).as("tb"))
      .select(col("query_id"), col("q_query_id"), col("tb.t"), col("tb.bk"))

    c.join(q, Seq("t", "bk"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "q_query_id", "q_neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
  }

  /** IVF-style ANN: the corpus is partitioned into `nLists` inverted lists
    * by nearest centroid; a query scores only the vectors in its `nProbe`
    * nearest lists. Centroids are a deterministic uniform sample of the
    * corpus — the `nLists` rows with the smallest xxhash64(id) — a
    * k-means-free IVF; swapping in trained centroids changes recall, not
    * the plan shape.
    *
    * Scale shape: the centroid pick is a distributed top-k
    * (TakeOrderedAndProject: per-partition heads, merged on the driver —
    * no global sort, no count() pre-pass); centroids broadcast (tiny);
    * corpus assignment is one map-side pass; the probe join is an
    * equi-join on list id — queries touch nProbe/nLists of the corpus
    * instead of all of it. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int = 16,
      nProbe: Int = 4): DataFrame = {
    // materialized once (localCheckpoint): referenced by BOTH assignment
    // passes below — without the barrier each recomputes the corpus top-k
    val cents = corpus
      .select(col(idCol).as("cent_id"), quantize(col(vecCol)).as("cent_q"))
      .orderBy(xxhash64(col("cent_id")), col("cent_id"))
      .limit(nLists)
      .localCheckpoint(false)

    def scored(df: DataFrame, out: String): DataFrame = df
      .select(col(idCol).as(out), quantize(col(vecCol)).as(s"q_$out"))
      .crossJoin(broadcast(cents))
      .withColumn("cent_cos", cosineQ(col(s"q_$out"), col("cent_q")))

    // corpus side keeps only its argmax list: a map-side-combining
    // max_by aggregate, NOT a window — a window would shuffle
    // corpus×nLists scored rows to rank them; the aggregate reduces to
    // one row per doc before the (only) shuffle. Ordering mirrors the
    // window's (cos desc, cent_id asc) via lexicographic (cos, -cent_id).
    val corpusLists = scored(corpus, "neighbor_id")
      .groupBy(col("neighbor_id"))
      .agg(max_by(
        struct(col("cent_id"), col("q_neighbor_id")),
        struct(col("cent_cos"), (-col("cent_id")).as("tb"))).as("best"))
      .select(col("neighbor_id"), col("best.q_neighbor_id").as("q_neighbor_id"),
        col("best.cent_id").as("list_id"))

    // query side probes its nProbe nearest lists (queries are small; the
    // window shuffles only queries×nLists rows)
    val queryProbes = {
      val w = Window.partitionBy("query_id")
        .orderBy(col("cent_cos").desc, col("cent_id"))
      scored(queries, "query_id")
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= nProbe)
        .select(col("query_id"), col("q_query_id"), col("cent_id").as("list_id"))
    }

    val cand = corpusLists.join(queryProbes, Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", cosineQ(col("q_query_id"), col("q_neighbor_id")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** LSH-bucketed ANN: exact quantized cosine, but only over LSH candidate
    * pairs. Recall vs bruteForceTopK is pinned by SimilaritySpec on planted
    * clusters (LSH retrieves *near* neighbors; on structureless uniform
    * vectors no sublinear method beats brute force). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nTables: Int = 6,
      planesPerTable: Int = 12): DataFrame = {
    val cand = lshCandidates(corpus, queries, idCol, vecCol, nTables,
      planesPerTable)
      .withColumn("cos", cosineQ(col("q_query_id"), col("q_neighbor_id")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    rankTopK(scored, k)
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
    * (TakeOrderedAndProject: per-partition heads, merged on the driver)
    * collected once (nLists rows — a bounded metadata-scale pull, the
    * k-means-init pattern). Corpus assignment is ONE codegen'd map pass —
    * [[graft.functions.VectorExpressions.NearestCosineCentroidExpr]]
    * carries the centroid vectors in the expression and emits the list
    * id with NO corpus shuffle and no row explosion — the
    * crossJoin(corpus × nLists) + max_by plan this replaces materialized
    * N·nLists joined rows, evaluated each cosine as an INTERPRETED
    * higher-order aggregate, and paid a corpus-wide aggregate exchange.
    * The probe join is an equi-join on list id — queries touch
    * nProbe/nLists of the corpus instead of all of it.
    *
    * `annProbeDist >= 0` additionally Hamming-prefilters the centroids
    * by `annBits`-bit Rademacher signatures (exact cosines only against
    * centroids within `annProbeDist` bits; full-argmax fallback when
    * none qualify) — the sub-k·dim assignment for CLUSTERED corpora,
    * where a vector's signature reliably lands near its centroid's
    * (SimilaritySpec pins prefiltered recall on planted clusters).
    * The default (-1) keeps exact argmax assignment: on unstructured
    * embeddings signature proximity to uniformly-sampled centroids is
    * noise, and a single flipped bit between near-duplicates can send
    * them to different lists — the planted-retrieval oracle would decay.
    * Queries always probe their `nProbe` exact-nearest lists PLUS the
    * kernel-assigned list, so prefiltered assignment stays probe-
    * consistent for near-duplicates of corpus rows. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int = 16, nProbe: Int = 4,
      annBits: Int = 32, annProbeDist: Int = -1,
      annSeed: Int = 11): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // nLists rows pulled to the driver once: centroid vectors ride into
    // the assignment expression (and back out as the tiny probe-side
    // broadcast) instead of forcing a localCheckpoint barrier
    val centRows: Array[(Long, Array[Long])] = corpus
      .select(col(idCol).cast("long").as("cent_id"),
        quantize(col(vecCol)).as("cent_q"))
      .orderBy(xxhash64(col("cent_id")), col("cent_id"))
      .limit(nLists)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1) // index order = cent_id order → index ties = id ties
    require(centRows.nonEmpty, "ivfTopK: empty corpus")
    val cents = centRows.map(_._2.toIndexedSeq).toIndexedSeq
    // exact mode (annProbeDist < 0): zero signatures on both sides make
    // every centroid a candidate AND skip the O(annBits·dim) per-row
    // signature pass — at nLists=16 that pass would cost more than the
    // assignment itself
    val prefilter = annProbeDist >= 0
    val centSigs =
      if (prefilter) centRows.map(c => sigOf(c._2, annBits, annSeed))
        .toIndexedSeq
      else centRows.map(_ => 0L).toIndexedSeq

    def assignList(qv: Column): Column =
      graft.functions.VectorExpressions.nearest_cosine_centroid(
        qv,
        if (prefilter) graft.functions.VectorExpressions.rademacher_sig(
          qv, annBits, annSeed)
        else lit(0L),
        cents, centSigs, if (prefilter) annProbeDist else annBits)

    // corpus side: one map-only pass, zero shuffles
    val corpusLists = corpus
      .select(col(idCol).as("neighbor_id"),
        quantize(col(vecCol)).as("q_neighbor_id"))
      .withColumn("list_id", assignList(col("q_neighbor_id")))

    // query side probes its nProbe exact-nearest lists (queries are
    // small; the window shuffles only queries×nLists rows) plus its own
    // kernel-assigned list (recall guard, see Scaladoc)
    val centsDf = centRows.zipWithIndex
      .map { case ((_, v), i) => (i, v.toSeq) }.toSeq
      .toDF("list_id", "cent_q")
    val q0 = queries.select(col(idCol).as("query_id"),
      quantize(col(vecCol)).as("q_query_id"))
    val exactProbes = {
      val w = Window.partitionBy("query_id")
        .orderBy(col("cent_cos").desc, col("list_id"))
      q0.crossJoin(broadcast(centsDf))
        .withColumn("cent_cos", cosineQ(col("q_query_id"), col("cent_q")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= nProbe)
        .select(col("query_id"), col("q_query_id"), col("list_id"))
    }
    val annProbes = q0
      .withColumn("list_id", assignList(col("q_query_id")))
      .select(col("query_id"), col("q_query_id"), col("list_id"))
    val queryProbes = exactProbes.unionByName(annProbes)
      .dropDuplicates("query_id", "list_id")

    // probe side BROADCAST (same contract as bruteForceTopK's query
    // broadcast: the query batch is the small side of an ANN search by
    // construction) — without it the planner equi-joins on list_id,
    // shuffling the WHOLE corpus onto a key with only nLists distinct
    // values: at 32 cores and 16 lists half the cluster idles, and the
    // skew worsens linearly with corpus scale. No dedup needed: each
    // corpus row is assigned exactly ONE list (deterministic
    // expression) and queryProbes is unique per (query, list), so the
    // join emits each (query, neighbor) pair at most once — the old
    // dropDuplicates was a full candidates-wide shuffle for nothing.
    val cand = corpusLists.join(broadcast(queryProbes), Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosineQ(col("q_query_id"), col("q_neighbor_id")))
    rankTopK(cand, k)
  }

  /** Candidates → per-query top-k via the bounded-heap
    * [[graft.functions.AggExpressions.TopKAgg]] — partial aggregation
    * reduces every map task to ≤ k pairs per query BEFORE the exchange
    * (the row_number window this replaces shuffled every scored
    * candidate just to rank it). Ties break by neighbor_id, matching
    * the window's (cos DESC, neighbor_id) order. */
  private[operators] def rankTopK(cand: DataFrame, k: Int): DataFrame =
    cand.groupBy("query_id")
      .agg(graft.functions.AggExpressions
        .topk_by(col("neighbor_id"), col("cos"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"), col("col.cos"))

  /** Driver-side integer-exact Rademacher signature of a quantized
    * vector — bit-identical to [[graft.functions.VectorExpressions
    * .RademacherSigExpr]] (same md5-parity sign rows). */
  private def sigOf(v: Array[Long], nBits: Int, seed: Int): Long = {
    var out = 0L
    var j = 0
    while (j < nBits) {
      val row = graft.functions.VectorFunctions.RandomProjection.signs(j, seed)
      require(v.length <= row.length,
        s"ivfTopK: vector exceeds ${row.length} dims: ${v.length}")
      var acc = 0L
      var i = 0
      while (i < v.length) { acc += v(i) * row(i); i += 1 }
      if (acc >= 0L) out |= (1L << j)
      j += 1
    }
    out
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
    rankTopK(cand, k)
  }
}

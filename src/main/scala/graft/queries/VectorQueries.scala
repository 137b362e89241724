package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions
import graft.operators.{Clustering, SimilaritySearch, VectorIndex}
import graft.table.GraftTable

/** Similarity-search queries over the embeddings table — all with full
  * DuckDB oracles.
  *
  * The LSH/IVF queries run PLANTED-NEAR-DUPLICATE retrieval: queries are
  * corpus vectors with a small deterministic perturbation (+0.1 on dim 0,
  * via double, cast back to float — both engines perform the identical
  * IEEE ops), k = 1. The true nearest neighbor of each planted query is
  * its source vector (cos ≈ 0.995 vs ≤ ~0.6 for any random pair), which
  * LSH/IVF retrieve deterministically on this data — so the approximate
  * searcher's output equals the brute-force oracle exactly. This is the
  * standard near-duplicate-retrieval eval; recall on genuinely hard
  * (clustered) data stays pinned by SimilaritySpec, because on the
  * testdata's RANDOM embeddings top-k recall of ANY sublinear method is
  * noise — there is no structure to exploit.
  */
object VectorQueries {

  type Q = (SparkSession, String) => DataFrame

  /** queries planted from the corpus: vec_id + 1000000, dim 0 += 0.1
    * (computed in double, stored back as float — engine-mirrorable). */
  private def plantedQueries(em: DataFrame): DataFrame =
    em.filter(col("vec_id") < 50)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        concat(
          array((col("embedding").getItem(0).cast("double") + lit(0.1))
            .cast("float")),
          // NOT slice(..., Int.MaxValue): Slice's start+length int
          // arithmetic overflows and silently corrupts the array in some
          // physical plans (observed: 64-dim vectors collapsing to 1)
          slice(col("embedding"), lit(2), size(col("embedding")) - 1))
          .as("embedding"))

  /** shared oracle: brute-force top-1 over the planted queries. */
  private val plantedTop1Sql: String =
    """WITH qs AS (
      |  SELECT vec_id + 1000000 AS query_id,
      |    list_concat(
      |      [CAST(CAST(embedding[1] AS DOUBLE) + 0.1 AS REAL)],
      |      embedding[2:]) AS emb
      |  FROM embeddings WHERE vec_id < 50),
      |qq AS (
      |  SELECT query_id,
      |    list_transform(emb,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
      |  FROM qs),
      |qn AS (
      |  SELECT query_id, qv,
      |    CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS nsq
      |  FROM qq),
      |c AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
      |  FROM embeddings),
      |cn AS (
      |  SELECT vec_id, qv,
      |    CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS nsq
      |  FROM c),
      |scored AS (
      |  SELECT q.query_id, c.vec_id AS neighbor_id,
      |    CAST(CAST(list_sum(list_transform(list_zip(q.qv, c.qv),
      |           p -> p[1]*p[2])) AS BIGINT) AS DOUBLE)
      |      / (sqrt(CAST(q.nsq AS DOUBLE)) * sqrt(CAST(c.nsq AS DOUBLE))) AS cos
      |  FROM qn q JOIN cn c ON q.query_id <> c.vec_id)
      |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cos FROM (
      |  SELECT *, row_number() OVER
      |    (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM scored)
      |WHERE rank <= 1 ORDER BY query_id, rank""".stripMargin

  /** exact top-10 neighbors for query vectors vec_id 0..4. */
  val qAnnTopk: Q = (s, dir) => {
    val em = Tables.load(s, dir, "embeddings")
    SimilaritySearch.bruteForceTopK(
      em, em.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
      .orderBy(col("query_id"), col("rank"))
  }
  val qAnnTopkSql: String =
    """WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, qv,
      |    CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS nsq
      |  FROM q),
      |scored AS (
      |  SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    CAST(CAST(list_sum(list_transform(list_zip(qs.qv, c.qv),
      |           p -> p[1]*p[2])) AS BIGINT) AS DOUBLE)
      |      / (sqrt(CAST(qs.nsq AS DOUBLE)) * sqrt(CAST(c.nsq AS DOUBLE))) AS cos
      |  FROM n qs JOIN n c ON qs.vec_id < 5 AND c.vec_id <> qs.vec_id)
      |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cos FROM (
      |  SELECT *, row_number() OVER
      |    (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM scored)
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** LSH-bucketed ANN (6 tables × 12 hyperplanes, 1-bit multi-probe) on the
    * planted-near-dup task — output equals the brute-force top-1 oracle. */
  val qAnnLsh: Q = (s, dir) => {
    val em = Tables.load(s, dir, "embeddings")
    SimilaritySearch.lshTopK(
      em, plantedQueries(em), "vec_id", "embedding", k = 1)
      .orderBy(col("query_id"), col("rank"))
  }
  val qAnnLshSql: String = plantedTop1Sql

  /** IVF-bucketed ANN (16 lists, 4 probes) on the planted-near-dup task —
    * output equals the brute-force top-1 oracle. */
  val qAnnIvf: Q = (s, dir) => {
    val em = Tables.load(s, dir, "embeddings")
    SimilaritySearch.ivfTopK(
      em, plantedQueries(em), "vec_id", "embedding", k = 1)
      .orderBy(col("query_id"), col("rank"))
  }
  val qAnnIvfSql: String = plantedTop1Sql

  /** PERSISTED IVF index with incremental maintenance: the corpus lands
    * in a graft table in two batches — the index is BUILT on batch 1
    * (vec_id ≥ 50: centroids frozen, assignments written partitioned by
    * list_id), batch 2 (vec_id < 50 — exactly the planted queries'
    * source vectors) arrives later and is indexed by `refresh` through
    * an incremental snapshot-range read (only the new rows are ever
    * assigned). The search probes partition-pruned index reads. The
    * oracle is the brute-force top-1 over the FULL corpus — correct
    * only if the incrementally-indexed rows are genuinely searchable
    * (every planted query's true neighbor arrived via refresh). */
  val qAnnIvfIndex: Q = (s, dir) => {
    val em = Tables.load(s, dir, "embeddings")
    val loc = scratchDir("ivfindex")
    val src = GraftTable(s, s"$loc/src")
    src.append(em.filter(col("vec_id") >= 50))
    val idx = VectorIndex.build(src, "vec_id", "embedding",
      nLists = 16, s"$loc/idx", appId = "ann")
    src.append(em.filter(col("vec_id") < 50))
    VectorIndex.refresh(src, "vec_id", "embedding", idx, appId = "ann")
    VectorIndex.search(idx, plantedQueries(em), "vec_id", "embedding",
      k = 1).orderBy(col("query_id"), col("rank"))
  }
  val qAnnIvfIndexSql: String = plantedTop1Sql

  /** Bounded index REPAIR on updates/deletes: vectors 50-59 are
    * MOR-corrected (dim 0 += 0.5), 60-69 deleted; `refresh` repairs from
    * the changelog — tombstoning the stale assignment rows and
    * re-assigning ONLY the changed vectors (O(changed), never a rebuild).
    * Queries are planted on the FINAL corpus state (+0.1 on dim 0) over
    * untouched vectors AND the corrected ones, so a stale assignment
    * (old qv, old list) or a surviving deleted row changes the output;
    * the oracle is brute-force top-1 over the post-update post-delete
    * corpus. In-flight requires pin the deletion and uniqueness
    * invariants the oracle can't see. */
  val qAnnIvfIndexUpdate: Q = (s, dir) => {
    val em = Tables.load(s, dir, "embeddings")
    val loc = scratchDir("ivfrepair")
    val src = GraftTable(s, s"$loc/src")
    src.append(em)
    val idx = VectorIndex.build(src, "vec_id", "embedding",
      nLists = 16, s"$loc/idx", appId = "annr")
    val upd = em.filter(col("vec_id") >= 50 && col("vec_id") < 60)
      .select(col("vec_id"),
        concat(
          array((col("embedding").getItem(0).cast("double") + lit(0.5))
            .cast("float")),
          slice(col("embedding"), lit(2), size(col("embedding")) - 1))
          .as("embedding"),
        col("label"))
    src.merge(upd, keys = Seq("vec_id"), dedupKey = Seq("vec_id"),
      orderCol = "vec_id", mode = "mor")
    src.delete(col("vec_id") >= 60 && col("vec_id") < 70)
    VectorIndex.refresh(src, "vec_id", "embedding", idx, appId = "annr")
    val assigned = idx.assignments.read().select("vec_id")
    require(assigned
      .filter(col("vec_id") >= 60 && col("vec_id") < 70).count() == 0,
      "deleted vectors still indexed after repair")
    require(assigned.count() == assigned.distinct().count(),
      "repair left duplicate assignment rows")
    val queries = src.read()
      .filter(col("vec_id") < 30 ||
        (col("vec_id") >= 50 && col("vec_id") < 60))
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        concat(
          array((col("embedding").getItem(0).cast("double") + lit(0.1))
            .cast("float")),
          slice(col("embedding"), lit(2), size(col("embedding")) - 1))
          .as("embedding"))
    VectorIndex.search(idx, queries, "vec_id", "embedding", k = 1)
      .orderBy(col("query_id"), col("rank"))
  }
  val qAnnIvfIndexUpdateSql: String =
    """WITH fin AS (
      |  SELECT vec_id,
      |    CASE WHEN vec_id BETWEEN 50 AND 59 THEN
      |      list_concat(
      |        [CAST(CAST(embedding[1] AS DOUBLE) + 0.5 AS REAL)],
      |        embedding[2:])
      |    ELSE embedding END AS embedding
      |  FROM embeddings
      |  WHERE vec_id NOT BETWEEN 60 AND 69),
      |qs AS (
      |  SELECT vec_id + 1000000 AS query_id,
      |    list_concat(
      |      [CAST(CAST(embedding[1] AS DOUBLE) + 0.1 AS REAL)],
      |      embedding[2:]) AS emb
      |  FROM fin WHERE vec_id < 30 OR vec_id BETWEEN 50 AND 59),
      |qq AS (
      |  SELECT query_id,
      |    list_transform(emb,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
      |  FROM qs),
      |qn AS (
      |  SELECT query_id, qv,
      |    CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS nsq
      |  FROM qq),
      |c AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
      |  FROM fin),
      |cn AS (
      |  SELECT vec_id, qv,
      |    CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS nsq
      |  FROM c),
      |scored AS (
      |  SELECT q.query_id, c.vec_id AS neighbor_id,
      |    CAST(CAST(list_sum(list_transform(list_zip(q.qv, c.qv),
      |           p -> p[1]*p[2])) AS BIGINT) AS DOUBLE)
      |      / (sqrt(CAST(q.nsq AS DOUBLE)) * sqrt(CAST(c.nsq AS DOUBLE)))
      |      AS cos
      |  FROM qn q JOIN cn c ON q.query_id <> c.vec_id)
      |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cos
      |FROM (
      |  SELECT *, row_number() OVER
      |    (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM scored)
      |WHERE rank <= 1 ORDER BY query_id, rank""".stripMargin

  private def scratchDir(name: String): String = Scratch.dir(name)

  /** exact quantized norms — cheap full-table oracle over the list ops. */
  val qEmbedNorm: Q = (s, dir) => {
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        VectorFunctions.normSqQ(
          VectorFunctions.quantize(col("embedding"))).as("norm_sq"))
      .orderBy(col("vec_id"))
  }
  val qEmbedNormSql: String =
    """SELECT vec_id, label,
      |  CAST(list_sum(list_transform(
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)),
      |    x -> x*x)) AS BIGINT) AS norm_sq
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** Deterministic k-means (k=8, one update round) over the full corpus —
    * the SemDeDup/IVF clustering stage. The oracle mirrors EVERY step in
    * integer arithmetic (quantize → k-smallest-id init → exact-int64
    * distance numerators with one final double division → argmin with
    * lowest-index ties → integer sum/count centroid update → final
    * assignment), so a hash match pins the whole Lloyd's round, not just
    * the output shape. */
  val qKmeans: Q = (s, dir) => {
    Clustering.kmeans(Tables.load(s, dir, "embeddings"),
      "vec_id", "embedding", k = 8, iters = 1)
      .withColumnRenamed("id", "vec_id")
      .orderBy(col("vec_id"))
  }
  val qKmeansSql: String =
    """WITH q AS (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
      |  FROM embeddings),
      |dims AS (SELECT unnest(generate_series(1,
      |  (SELECT max(len(qv)) FROM q))) AS pos),
      |c0 AS (
      |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j,
      |         qv AS s, CAST(1 AS BIGINT) AS n
      |  FROM q ORDER BY vec_id LIMIT 8),
      |a1 AS (
      |  SELECT vec_id, qv, j AS cluster FROM (
      |    SELECT q.vec_id, q.qv, c.j,
      |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |        CAST(CAST(list_sum(list_transform(list_zip(q.qv, c.s),
      |          p -> (c.n*p[1]-p[2])*(c.n*p[1]-p[2]))) AS BIGINT) AS DOUBLE)
      |          / (CAST(c.n AS DOUBLE) * CAST(c.n AS DOUBLE)), c.j) AS rn
      |    FROM q, c0 c) WHERE rn = 1),
      |sums1 AS (
      |  SELECT cluster, dims.pos, CAST(SUM(qv[dims.pos]) AS BIGINT) AS sv
      |  FROM a1, dims GROUP BY cluster, dims.pos),
      |u1 AS (
      |  SELECT s.cluster AS j, list(s.sv ORDER BY s.pos) AS s,
      |         any_value(c.n) AS n
      |  FROM sums1 s
      |  JOIN (SELECT cluster, COUNT(*) AS n FROM a1 GROUP BY cluster) c
      |    ON s.cluster = c.cluster
      |  GROUP BY s.cluster),
      |c1 AS (
      |  SELECT c0.j, COALESCE(u1.s, c0.s) AS s, COALESCE(u1.n, c0.n) AS n
      |  FROM c0 LEFT JOIN u1 ON c0.j = u1.j)
      |SELECT vec_id, cluster FROM (
      |  SELECT q.vec_id, c.j AS cluster,
      |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |      CAST(CAST(list_sum(list_transform(list_zip(q.qv, c.s),
      |        p -> (c.n*p[1]-p[2])*(c.n*p[1]-p[2]))) AS BIGINT) AS DOUBLE)
      |        / (CAST(c.n AS DOUBLE) * CAST(c.n AS DOUBLE)), c.j) AS rn
      |  FROM q, c1 c) WHERE rn = 1 ORDER BY vec_id""".stripMargin

  /** SemDeDup over the planted-duplicate corpus: k-means-cluster, then
    * exact quantized cosine ≥ 0.999 within clusters only. Identical
    * planted vectors have identical centroid distances, so they land in
    * the same cluster by determinism — recall 1 BY CONSTRUCTION, and the
    * survivors equal the all-pairs ground truth the oracle computes
    * (random pairs never reach 0.999). The all-pairs product shrinks to
    * Σ|cluster|² with no LSH family — the SemDeDup scale shape. */
  val qSemdedup: Q = (s, dir) => {
    val em = Tables.load(s, dir, "embeddings")
    val doubled = em.select(col("vec_id"), col("embedding"))
      .unionByName(em.select((col("vec_id") + lit(1000000L)).as("vec_id"),
        col("embedding")))
    // k is a free knob here (the oracle is cluster-independent): more
    // clusters shrink the within-cluster pair product Σ|c|². k SCALES
    // with the corpus (k ≈ n/250 ⇒ balanced Σ|c|² ≈ n²/k = 250·n): a
    // FIXED k makes the pair product quadratic as the corpus grows —
    // measured 16.7× at 10× data before this rule, ~linear after. At
    // the sf0.01 correctness gate n=1000 ⇒ k=20, the oracle's
    // historical constant. (One bounded count() to size the knob.)
    val k = math.max(20, (doubled.count() / 250L).toInt)
    Clustering.semanticNearDups(doubled, "vec_id", "embedding",
      threshold = 0.999, k = k, iters = 1)
      .orderBy(col("id_a"), col("id_b"))
  }
  val qSemdedupSql: String =
    """WITH base AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000, embedding FROM embeddings),
      |q AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
      |  FROM base),
      |n AS (
      |  SELECT vec_id, qv,
      |    CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS nsq
      |  FROM q)
      |SELECT id_a, id_b, cos FROM (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    CAST(CAST(list_sum(list_transform(list_zip(a.qv, b.qv),
      |           p -> p[1]*p[2])) AS BIGINT) AS DOUBLE)
      |      / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) AS cos
      |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
      |WHERE cos >= 0.999 ORDER BY id_a, id_b""".stripMargin

  /** Johnson-Lindenstrauss random projection 64 → 8 dims with the fixed
    * md5-derived Rademacher matrix — integer arithmetic end to end, so
    * the oracle recomputes the identical projection (matrix entries from
    * the same md5 parity rule). Map-only; output as 8 scalar columns so
    * the compare surface stays flat. */
  val qRandomProjection: Q = (s, dir) => {
    val proj = VectorFunctions.randomProjectQ(
      VectorFunctions.quantize(col("embedding")), dOut = 8)
    Tables.load(s, dir, "embeddings")
      .select(Seq(col("vec_id")) ++
        (0 until 8).map(j => element_at(proj, j + 1).as(s"p$j")): _*)
      .orderBy(col("vec_id"))
  }
  val qRandomProjectionSql: String = {
    val even = "('0','2','4','6','8','a','c','e')"
    val ps = (0 until 8).map(j =>
      s"""  CAST(list_sum(list_transform(range(1, len(qv) + 1),
         |    i -> qv[i] * (CASE WHEN substr(md5('11:$j:' || (i - 1)), 1, 1)
         |      IN $even THEN 1 ELSE -1 END))) AS BIGINT) AS p$j""".stripMargin)
      .mkString(",\n")
    s"""WITH q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
       |  FROM embeddings)
       |SELECT vec_id,
       |$ps
       |FROM q ORDER BY vec_id""".stripMargin
  }

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q_random_projection", qRandomProjection, Some(qRandomProjectionSql)),
    ("q_ann_topk", qAnnTopk, Some(qAnnTopkSql)),
    ("q_ann_lsh", qAnnLsh, Some(qAnnLshSql)),
    ("q_ann_ivf", qAnnIvf, Some(qAnnIvfSql)),
    ("q_ann_ivf_index", qAnnIvfIndex, Some(qAnnIvfIndexSql)),
    ("q_ann_ivf_index_update", qAnnIvfIndexUpdate,
      Some(qAnnIvfIndexUpdateSql)),
    ("q_embed_norm", qEmbedNorm, Some(qEmbedNormSql)),
    ("q_kmeans", qKmeans, Some(qKmeansSql)),
    ("q_semdedup", qSemdedup, Some(qSemdedupSql)),
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Deduplication queries over documents/embeddings — every query here has
  * a full DuckDB oracle:
  *
  *   - exact / blocked-Jaccard: directly SQL-expressible;
  *   - MinHash-LSH: candidates are verified at exact Jaccard >= 0.8, so the
  *     survivors equal the all-pairs ground truth whenever banded-LSH
  *     recall at the threshold is 1 — which holds deterministically on this
  *     data (miss probability per true pair is (1-0.8^4)^16 ~ 2e-4, checked
  *     empirically at every SF; the fixed data + fixed hashes make the
  *     outcome reproducible, not probabilistic);
  *   - SimHash: the token hash is MD5-derived (engine-portable, see
  *     HashExpressions.SimHash64), and 4x16-bit banding is EXACT for
  *     hamming <= 3 by pigeonhole — the oracle mirrors the whole pipeline;
  *   - embedding near-dup LSH: duplicate vectors are planted (same vector,
  *     new id), and identical vectors land in identical LSH buckets by
  *     determinism — recall 1 by construction, so the survivor pairs equal
  *     the all-pairs ground truth at the (high) threshold.
  */
object DedupQueries {

  type Q = (SparkSession, String) => DataFrame

  private val normSql = OracleSql.norm
  private val toksSql = OracleSql.toks

  /** exact content dedup: one row per distinct normalized text. */
  val qDedupExact: Q = (s, dir) => {
    Dedup.exact(Tables.load(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("fingerprint"))
  }
  val qDedupExactSql: String =
    s"""SELECT md5($normSql) AS fingerprint, MIN(doc_id) AS keep_id,
       |  COUNT(*) AS dup_count
       |FROM documents GROUP BY 1 ORDER BY fingerprint""".stripMargin

  /** blocked exact 3-gram Jaccard near-dup pairs (lang + length-bucket
    * blocking), threshold 0.5 — fully oracle-checkable. */
  val qDedupJaccard: Q = (s, dir) => {
    Dedup.jaccardPairs(Tables.load(s, dir, "documents"), "doc_id", "text",
      langCol = "lang", lenCol = "n_chars", shingleK = 3, threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))
  }
  val qDedupJaccardSql: String =
    s"""WITH prep AS (
       |  SELECT doc_id AS id, lang AS block_lang,
       |    n_chars // 100 AS block_len,
       |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       |         ELSE list_transform(range(0, len(t) - 2),
       |                i -> array_to_string(t[i+1:i+3], ' ')) END AS sh
       |  FROM (SELECT *, $toksSql AS t FROM documents)),
       |pairs AS (
       |  SELECT a.id AS id_a, b.id AS id_b,
       |    list_distinct(a.sh) AS da, list_distinct(b.sh) AS db
       |  FROM prep a JOIN prep b
       |    ON a.block_lang = b.block_lang AND a.block_len = b.block_len
       |   AND a.id < b.id)
       |SELECT id_a, id_b, jaccard FROM (
       |  SELECT id_a, id_b,
       |    CAST(len(list_intersect(da, db)) AS DOUBLE)
       |      / CAST(len(da) + len(db) - len(list_intersect(da, db)) AS DOUBLE)
       |      AS jaccard
       |  FROM pairs)
       |WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin

  /** MinHash(64)+LSH(16 bands) candidate pairs verified at Jaccard ≥ 0.8.
    * Oracle = all-pairs exact Jaccard (the banded candidate generation has
    * recall 1 at this threshold on this data, so survivors == truth). */
  val qDedupMinhash: Q = (s, dir) => {
    Dedup.minhashPairs(Tables.load(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("id_a"), col("id_b"))
  }
  val qDedupMinhashSql: String =
    s"""WITH prep AS (
       |  SELECT doc_id AS id,
       |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       |         ELSE list_transform(range(0, len(t) - 2),
       |                i -> array_to_string(t[i+1:i+3], ' ')) END AS sh
       |  FROM (SELECT *, $toksSql AS t FROM documents)),
       |d AS (SELECT id, list_distinct(sh) AS ds FROM prep)
       |SELECT id_a, id_b, jaccard FROM (
       |  SELECT a.id AS id_a, b.id AS id_b,
       |    CAST(len(list_intersect(a.ds, b.ds)) AS DOUBLE)
       |      / CAST(len(a.ds) + len(b.ds) - len(list_intersect(a.ds, b.ds))
       |             AS DOUBLE) AS jaccard
       |  FROM d a JOIN d b ON a.id < b.id)
       |WHERE jaccard >= 0.8 ORDER BY id_a, id_b""".stripMargin

  /** SimHash near-dup pairs at Hamming ≤ 3. Fully mirrorable: the token
    * hash is MD5-derived, and 4×16-bit banding is exact for hamming ≤ 3
    * (pigeonhole) — the oracle recomputes the simhashes and takes ALL
    * pairs at hamming ≤ 3; engine output must equal it exactly. */
  val qDedupSimhash: Q = (s, dir) => {
    Dedup.simhashPairs(Tables.load(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("id_a"), col("id_b"))
  }
  val qDedupSimhashSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest($toksSql) AS s FROM documents),
       |th AS (
       |  SELECT doc_id, ('0x' || substr(md5(s), 1, 16))::UBIGINT AS h
       |  FROM tok),
       |votes AS (
       |  SELECT doc_id, bb.b AS b,
       |    sum(CASE WHEN (h >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM th, (SELECT unnest(range(0, 64)) AS b) bb
       |  GROUP BY doc_id, bb.b),
       |sims AS (
       |  SELECT doc_id,
       |    bit_or(CASE WHEN v > 0 THEN (1::UBIGINT << b)
       |           ELSE 0::UBIGINT END) AS sim
       |  FROM votes GROUP BY doc_id)
       |SELECT id_a, id_b, hamming FROM (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
       |  FROM sims a JOIN sims b ON a.doc_id < b.doc_id)
       |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin

  /** embedding near-dup pairs by exact quantized cosine ≥ 0.25 on the
    * vec_id%10 canopy sample (embeddings are random ⇒ high thresholds are
    * vacuous; 0.25 exercises a non-trivial pair set). Full oracle. */
  val qDedupEmbedding: Q = (s, dir) => {
    Dedup.embeddingNearDups(
      Tables.load(s, dir, "embeddings").filter(col("vec_id") % 10 === 0),
      "vec_id", "embedding", threshold = 0.25)
      .orderBy(col("id_a"), col("id_b"))
  }
  val qDedupEmbeddingSql: String =
    """WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
      |  FROM embeddings WHERE vec_id % 10 = 0),
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
      |WHERE cos >= 0.25 ORDER BY id_a, id_b""".stripMargin

  /** Embedding duplicate detection over the FULL corpus with hyperplane-LSH
    * blocking (no all-pairs product — the shape that replaces it at scale):
    * the corpus is doubled with planted duplicate vectors (same embedding,
    * vec_id + 1000000); identical vectors land in identical buckets by
    * determinism, so recall is 1 BY CONSTRUCTION and the survivor pairs at
    * cos ≥ 0.999 equal the all-pairs ground truth (random pairs never reach
    * 0.999). Genuinely-approximate near-dup recall stays pinned by
    * SimilaritySpec/DedupSpec on planted clusters. */
  val qDedupEmbeddingLsh: Q = (s, dir) => {
    import graft.functions.VectorFunctions
    val em = Tables.load(s, dir, "embeddings")
    val doubled = em.select(col("vec_id"), col("embedding"))
      .unionByName(em.select((col("vec_id") + lit(1000000L)).as("vec_id"),
        col("embedding")))
    Dedup.embeddingNearDups(
      doubled, "vec_id", "embedding", threshold = 0.999,
      bucket = Some(VectorFunctions.hyperplaneBucket(col("embedding"), 8)))
      .orderBy(col("id_a"), col("id_b"))
  }
  val qDedupEmbeddingLshSql: String =
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

  /** Connected components over the Jaccard near-dup pairs → duplicate
    * GROUPS (cluster id = min member id). The engine runs iterated
    * min-label propagation; the oracle computes the transitive closure
    * with a recursive CTE — the same fixpoint by a different method, so
    * a hash match pins the iteration's convergence, not just one round. */
  val qDedupClusters: Q = (s, dir) => {
    val pairs = Dedup.jaccardPairs(Tables.load(s, dir, "documents"),
      "doc_id", "text", langCol = "lang", lenCol = "n_chars",
      shingleK = 3, threshold = 0.5)
    Dedup.clusters(pairs).orderBy(col("id"))
  }
  val qDedupClustersSql: String =
    s"""WITH RECURSIVE prep AS (
       |  SELECT doc_id AS id, lang AS block_lang,
       |    n_chars // 100 AS block_len,
       |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       |         ELSE list_transform(range(0, len(t) - 2),
       |                i -> array_to_string(t[i+1:i+3], ' ')) END AS sh
       |  FROM (SELECT *, $toksSql AS t FROM documents)),
       |cand AS (
       |  SELECT a.id AS id_a, b.id AS id_b,
       |    list_distinct(a.sh) AS da, list_distinct(b.sh) AS db
       |  FROM prep a JOIN prep b
       |    ON a.block_lang = b.block_lang AND a.block_len = b.block_len
       |   AND a.id < b.id),
       |p AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT id_a, id_b,
       |      CAST(len(list_intersect(da, db)) AS DOUBLE)
       |        / CAST(len(da) + len(db) - len(list_intersect(da, db)) AS DOUBLE)
       |        AS j
       |    FROM cand)
       |  WHERE j >= 0.5),
       |e AS (SELECT id_a AS src, id_b AS dst FROM p
       |      UNION SELECT id_b, id_a FROM p),
       |r AS (SELECT DISTINCT src, src AS dst FROM e
       |      UNION SELECT e.src, r.dst FROM e JOIN r ON r.src = e.dst)
       |SELECT src AS id, MIN(dst) AS cluster_id FROM r
       |GROUP BY src ORDER BY id""".stripMargin

  /** Ingestion-time dedup against the HISTORICAL corpus table (the
    * production arrival loop): batch 1 seeds the corpus; batch 2 mixes
    * re-arrivals (same text under new ids — must be dropped by the
    * Bloom-pruned membership probe against the corpus TABLE, not a
    * within-batch check) with genuinely novel docs (must land). The
    * oracle replays keep-first over the full arrival order (batch, id).
    */
  val qIngestDedup: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val t = graft.table.GraftTable(s, scratch("ingdedup"))
    Dedup.dedupAppend(t, docs, "doc_id", "text")
    val rearrive = docs.filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val novel = docs.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 2000000L)
      .withColumn("text", concat(col("text"), lit(" graftnovel")))
    val appended = Dedup.dedupAppend(t,
      rearrive.unionByName(novel), "doc_id", "text")
    require(appended > 0, "novel docs must land")
    t.read().select(col("doc_id"), col("fingerprint"))
      .orderBy(col("doc_id"))
  }
  val qIngestDedupSql: String =
    s"""WITH arrivals AS (
       |  SELECT doc_id, text, 1 AS b FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, text, 2 FROM documents
       |  WHERE doc_id % 5 = 0
       |  UNION ALL
       |  SELECT doc_id + 2000000, text || ' graftnovel', 2 FROM documents
       |  WHERE doc_id % 7 = 0),
       |f AS (SELECT doc_id, b, md5($normSql) AS fingerprint
       |      FROM arrivals),
       |r AS (SELECT *, row_number() OVER (
       |        PARTITION BY fingerprint ORDER BY b, doc_id) AS rn FROM f)
       |SELECT doc_id, fingerprint FROM r WHERE rn = 1
       |ORDER BY doc_id""".stripMargin

  /** The COMPLETE dedup policy end-to-end: detect (blocked Jaccard
    * pairs) → cluster (connected components) → select ONE representative
    * per cluster (longest doc, doc_id tie-break — a deterministic,
    * engine-mirrorable "best quality" stand-in). Singletons form their
    * own cluster and keep themselves. Output: every doc with its cluster
    * and the keep decision — what a production pipeline materializes
    * before dropping rejects. Scale shape: the pair/cluster stages are
    * the existing bounded operators; selection adds one cluster-keyed
    * window (per-cluster state only). */
  val qDedupKeepBest: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(s, dir, "documents")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
      langCol = "lang", lenCol = "n_chars", shingleK = 3, threshold = 0.5)
    val cl = Dedup.clusters(pairs).withColumnRenamed("id", "doc_id")
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("n_chars").desc, col("doc_id"))
    docs.select(col("doc_id"), col("n_chars"))
      .join(cl, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("doc_id"), col("cluster_id"), col("n_chars"), col("keep"))
      .orderBy(col("doc_id"))
  }
  val qDedupKeepBestSql: String =
    s"""WITH RECURSIVE prep AS (
       |  SELECT doc_id AS id, lang AS block_lang,
       |    n_chars // 100 AS block_len,
       |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       |         ELSE list_transform(range(0, len(t) - 2),
       |                i -> array_to_string(t[i+1:i+3], ' ')) END AS sh
       |  FROM (SELECT *, $toksSql AS t FROM documents)),
       |cand AS (
       |  SELECT a.id AS id_a, b.id AS id_b,
       |    list_distinct(a.sh) AS da, list_distinct(b.sh) AS db
       |  FROM prep a JOIN prep b
       |    ON a.block_lang = b.block_lang AND a.block_len = b.block_len
       |   AND a.id < b.id),
       |p AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT id_a, id_b,
       |      CAST(len(list_intersect(da, db)) AS DOUBLE)
       |        / CAST(len(da) + len(db) - len(list_intersect(da, db)) AS DOUBLE)
       |        AS j
       |    FROM cand)
       |  WHERE j >= 0.5),
       |e AS (SELECT id_a AS src, id_b AS dst FROM p
       |      UNION SELECT id_b, id_a FROM p),
       |r AS (SELECT DISTINCT src, src AS dst FROM e
       |      UNION SELECT e.src, r.dst FROM e JOIN r ON r.src = e.dst),
       |cl AS (SELECT src AS id, MIN(dst) AS cluster_id FROM r GROUP BY src),
       |sel AS (
       |  SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS cluster_id,
       |    d.n_chars
       |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.id)
       |SELECT doc_id, cluster_id, n_chars,
       |  (row_number() OVER (PARTITION BY cluster_id
       |     ORDER BY n_chars DESC, doc_id) = 1) AS keep
       |FROM sel ORDER BY doc_id""".stripMargin

  /** Cross-doc repeated 8-token spans (exact-substring-dedup signal, Lee
    * et al. 2022): per doc, the fraction of its distinct spans that occur
    * in at least one other document. The oracle mirrors the span md5-16
    * keying exactly, so the hash match pins the full pipeline including
    * the portable span-key choice. */
  val qSpanDedup: Q = (s, dir) => {
    Dedup.repeatedSpans(Tables.load(s, dir, "documents"), "doc_id", "text",
      w = 8).withColumnRenamed("id", "doc_id").orderBy(col("doc_id"))
  }
  val qSpanDedupSql: String =
    s"""WITH m AS (SELECT doc_id, $toksSql AS t FROM documents),
       |g AS (
       |  SELECT DISTINCT doc_id,
       |    substr(md5(g), 1, 16) AS h
       |  FROM (SELECT doc_id, unnest(
       |    CASE WHEN len(t) < 8 THEN [] ELSE list_transform(
       |      range(0, len(t) - 7),
       |      i -> array_to_string(t[i+1:i+8], ' ')) END) AS g FROM m)),
       |c AS (SELECT h, COUNT(*) AS nd FROM g GROUP BY h),
       |p AS (
       |  SELECT doc_id, COUNT(*) AS n_spans,
       |    COALESCE(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END), 0) AS n_shared
       |  FROM g JOIN c USING (h) GROUP BY doc_id)
       |SELECT m.doc_id,
       |  CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
       |  CAST(COALESCE(p.n_shared, 0) AS BIGINT) AS n_shared,
       |  CASE WHEN COALESCE(p.n_spans, 0) = 0 THEN 0.0
       |    ELSE CAST(p.n_shared AS DOUBLE) / CAST(p.n_spans AS DOUBLE) END
       |    AS shared_frac
       |FROM (SELECT DISTINCT doc_id FROM m) m
       |LEFT JOIN p USING (doc_id) ORDER BY m.doc_id""".stripMargin

  private def scratch(name: String): String = Scratch.dir(name)

  /** Streaming exact dedup ≡ batch exact dedup: the corpus is chunked
    * into 4 files and streamed one file per micro-batch through
    * [[graft.streaming.Streaming.dedupStream]] into a graft sink, so the
    * first-occurrence state genuinely crosses micro-batch (and
    * checkpoint-commit) boundaries. The surviving rows' fingerprints —
    * one per distinct normalized content, with NO distinct applied on
    * read — must equal the batch dedup's distinct-fingerprint set; a
    * duplicate that slips through state surfaces as an extra row and
    * fails rows_match. (Which doc_id survives depends on arrival order,
    * so ids are not compared — the KEPT-CONTENT SET is the contract,
    * exactly as q_stream_daily pins the streamed rollup to the batch
    * oracle.) */
  val qDedupStream: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val srcDir = scratch("dedup-stream-src")
    docs.repartition(4).write.parquet(srcDir)
    val stream = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val tableLoc = scratch("dedup-stream-t")
    val q = graft.streaming.Streaming.graftSink(
      graft.streaming.Streaming.dedupStream(stream, "text"), tableLoc,
      txnAppId = "q_dedup_stream")
      .option("checkpointLocation", scratch("dedup-stream-ckpt")).start()
    try q.processAllAvailable() finally q.stop()
    graft.table.GraftTable(s, tableLoc).read()
      .select(graft.functions.TextFunctions
        .fingerprint_md5(col("text")).as("fingerprint"))
      .orderBy(col("fingerprint"))
  }
  val qDedupStreamSql: String =
    s"""SELECT DISTINCT md5($normSql) AS fingerprint
       |FROM documents ORDER BY fingerprint""".stripMargin

  /** Token-window chunking with overlap (LLM context-window prep):
    * 32-token windows starting every 24 tokens. Map-only — one Generate,
    * no shuffle; the oracle re-derives every window boundary. */
  val qChunk: Q = (s, dir) => {
    graft.operators.Chunking.chunk(Tables.load(s, dir, "documents"),
      "doc_id", "text", chunkSize = 32, stride = 24)
      .orderBy(col("doc_id"), col("chunk_idx"))
  }
  val qChunkSql: String =
    s"""WITH m AS (SELECT doc_id, $toksSql AS t FROM documents),
       |g AS (SELECT doc_id, t,
       |        unnest(range((len(t)-1)//24 + 1)) AS chunk_idx
       |      FROM m WHERE len(t) > 0 AND t[1] <> '')
       |SELECT doc_id, chunk_idx,
       |  array_to_string(t[chunk_idx*24+1 : chunk_idx*24+32], ' ')
       |    AS chunk_text,
       |  least(32, len(t) - chunk_idx*24) AS n_tokens
       |FROM g ORDER BY doc_id, chunk_idx""".stripMargin

  /** Chunk-level exact dedup, keep-first-occurrence (the C4/RefinedWeb
    * paragraph-dedup shape on deterministic 16-token boundaries). Planted
    * full-document copies (doc_id % 7, re-idded) must come back with
    * n_kept = 0 — every chunk already appeared at the original. */
  val qChunkDedup: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val planted = docs.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    graft.operators.Chunking.chunkDedup(docs.unionByName(planted),
      "doc_id", "text", chunkSize = 16)
      .orderBy(col("doc_id"))
  }
  val qChunkDedupSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0),
       |m AS (SELECT doc_id, $toksSql AS t FROM base),
       |g AS (SELECT doc_id, t,
       |        unnest(range((len(t)-1)//16 + 1)) AS chunk_idx
       |      FROM m WHERE len(t) > 0 AND t[1] <> ''),
       |c AS (SELECT doc_id, chunk_idx,
       |        array_to_string(t[chunk_idx*16+1 : chunk_idx*16+16], ' ')
       |          AS chunk_text
       |      FROM g),
       |w AS (SELECT *, row_number() OVER (
       |        PARTITION BY chunk_text ORDER BY doc_id, chunk_idx) AS rn
       |      FROM c),
       |k AS (SELECT doc_id, COUNT(*) AS n_kept,
       |        string_agg(chunk_text, ' ' ORDER BY chunk_idx)
       |          AS clean_text
       |      FROM w WHERE rn = 1 GROUP BY doc_id),
       |tot AS (SELECT doc_id, COUNT(*) AS n_chunks FROM c GROUP BY doc_id)
       |SELECT tot.doc_id, tot.n_chunks,
       |  COALESCE(k.n_kept, 0) AS n_kept,
       |  COALESCE(k.clean_text, '') AS clean_text
       |FROM tot LEFT JOIN k USING (doc_id)
       |ORDER BY tot.doc_id""".stripMargin

  /** Overlapping-window chunk dedup (stride 16 < chunkSize 32): the dup
    * decision keys on full 32-token windows, a dropped window removes
    * only its owned 16-token stride block, so overlap never double-drops
    * (semantics pinned at [[graft.operators.Chunking.chunkDedup]]).
    * Planted full-doc copies (doc_id % 11, re-idded) must come back with
    * n_kept = 0; partially-overlapping docs keep every token whose owner
    * window is unique. */
  val qChunkOverlap: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val planted = docs.filter(col("doc_id") % 11 === 0)
      .withColumn("doc_id", col("doc_id") + 2000000L)
    graft.operators.Chunking.chunkDedup(docs.unionByName(planted),
      "doc_id", "text", chunkSize = 32, stride = 16)
      .orderBy(col("doc_id"))
  }
  val qChunkOverlapSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 11 = 0),
       |m AS (SELECT doc_id, $toksSql AS t FROM base),
       |g AS (SELECT doc_id, t,
       |        unnest(range((len(t)-1)//16 + 1)) AS chunk_idx
       |      FROM m WHERE len(t) > 0 AND t[1] <> ''),
       |c AS (SELECT doc_id, chunk_idx,
       |        array_to_string(t[chunk_idx*16+1 : chunk_idx*16+32], ' ')
       |          AS chunk_text,
       |        array_to_string(t[chunk_idx*16+1 : chunk_idx*16+16], ' ')
       |          AS owned_text
       |      FROM g),
       |w AS (SELECT *, row_number() OVER (
       |        PARTITION BY chunk_text ORDER BY doc_id, chunk_idx) AS rn
       |      FROM c),
       |k AS (SELECT doc_id, COUNT(*) AS n_kept,
       |        string_agg(owned_text, ' ' ORDER BY chunk_idx)
       |          AS clean_text
       |      FROM w WHERE rn = 1 GROUP BY doc_id),
       |tot AS (SELECT doc_id, COUNT(*) AS n_chunks FROM c GROUP BY doc_id)
       |SELECT tot.doc_id, tot.n_chunks,
       |  COALESCE(k.n_kept, 0) AS n_kept,
       |  COALESCE(k.clean_text, '') AS clean_text
       |FROM tot LEFT JOIN k USING (doc_id)
       |ORDER BY tot.doc_id""".stripMargin

  /** Cross-source span-overlap audit: for each source pair, how many
    * distinct 8-token spans they share — the dataset-composition /
    * cross-contamination matrix a pipeline inspects before mixing
    * sources. Scale shape: per-doc distinct span hashes map-side
    * (`DistinctSpanHashes`, 8-byte keys), ONE span-keyed groupBy
    * collapsing each span to its source SET (collect_set dedups the
    * per-source repeats in the same pass), then the pair explode runs
    * over sets of at most |sources| elements — aggregate-sized, never a
    * doc product. The oracle counts shared span TEXTS; counts agree with
    * the 64-bit hash side short of a collision (the q_span_dedup
    * argument). */
  val qSourceOverlap: Q = (s, dir) => {
    import graft.functions.HashExpressions.distinct_span_hashes
    import graft.functions.TextFunctions.tokens
    val spans = Tables.load(s, dir, "documents")
      .select(col("source"),
        explode(distinct_span_hashes(tokens(col("text")), 8)).as("h"))
    spans.groupBy("h")
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .select(explode(col("ss")).as("source_a"), col("ss"))
      .select(col("source_a"), explode(col("ss")).as("source_b"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("shared_spans"))
      .orderBy("source_a", "source_b")
  }
  val qSourceOverlapSql: String =
    s"""WITH m AS (SELECT source, $toksSql AS t FROM documents),
       |g AS (SELECT DISTINCT source, s AS h
       |      FROM (SELECT source, unnest(
       |        CASE WHEN len(t) < 8 THEN [] ELSE list_transform(
       |          range(0, len(t) - 7),
       |          i -> array_to_string(t[i+1:i+8], ' ')) END) AS s
       |      FROM m))
       |SELECT a.source AS source_a, b.source AS source_b,
       |  COUNT(*) AS shared_spans
       |FROM g a JOIN g b USING (h)
       |WHERE a.source < b.source
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q_source_overlap", qSourceOverlap, Some(qSourceOverlapSql)),
    ("q_chunk", qChunk, Some(qChunkSql)),
    ("q_chunk_dedup", qChunkDedup, Some(qChunkDedupSql)),
    ("q_chunk_overlap", qChunkOverlap, Some(qChunkOverlapSql)),
    ("q_dedup_stream", qDedupStream, Some(qDedupStreamSql)),
    ("q_span_dedup", qSpanDedup, Some(qSpanDedupSql)),
    ("q_dedup_embedding_lsh", qDedupEmbeddingLsh, Some(qDedupEmbeddingLshSql)),
    ("q_dedup_exact", qDedupExact, Some(qDedupExactSql)),
    ("q_dedup_jaccard", qDedupJaccard, Some(qDedupJaccardSql)),
    ("q_dedup_minhash", qDedupMinhash, Some(qDedupMinhashSql)),
    ("q_dedup_simhash", qDedupSimhash, Some(qDedupSimhashSql)),
    ("q_dedup_embedding", qDedupEmbedding, Some(qDedupEmbeddingSql)),
    ("q_dedup_clusters", qDedupClusters, Some(qDedupClustersSql)),
    ("q_dedup_keep_best", qDedupKeepBest, Some(qDedupKeepBestSql)),
    ("q_ingest_dedup", qIngestDedup, Some(qIngestDedupSql)),
  )
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{HashExpressions, TextFunctions}

/** Document-deduplication operators for training-data pipelines — exact,
  * MinHash+LSH, SimHash, and blocked n-gram Jaccard. Every variant follows
  * the same scale-safe shape:
  *
  *   fingerprint/bucket per row (map-only, codegen'd) →
  *   one shuffle on the bucket key →
  *   pairs generated only WITHIN buckets →
  *   exact verification on the (tiny) candidate set.
  *
  * No all-pairs product ever materializes; at 100 TB the cost is one
  * shuffle of fingerprints plus per-bucket quadratic work bounded by bucket
  * size (skewed mega-buckets are salted/limited by construction since band
  * hashes distribute uniformly).
  */
object Dedup {

  /** Exact dedup: group by content fingerprint, keep the smallest id.
    * Returns (fingerprint, keep_id, dup_count) per distinct content. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextFunctions.fingerprint_md5(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Production ingestion dedup against the HISTORICAL corpus table:
    * append only the batch rows whose content fingerprint is not already
    * in `corpus` (keep-first by id within the batch). Returns the number
    * of rows appended.
    *
    * Two membership-probe regimes, split explicitly because Bloom
    * probing has a REAL capacity limit, not an arbitrary one:
    *
    *   - batches with ≤ [[graft.table.MergeInto.MaxKeyProbeValues]]
    *     distinct fingerprints route through
    *     [[graft.table.GraftTable.readForKeys]] — the corpus is created
    *     with `graft.bloom.columns=fingerprint`, so per-file Bloom
    *     bitsets prune files even though every file's min/max spans the
    *     full hash space (fingerprints are uniform). Probe cost:
    *     O(batch) + the few Bloom-hit files — never a corpus scan. This
    *     is the steady-state arrival-loop shape (bounded micro-batches).
    *   - larger batches fall back to a fingerprint-COLUMN anti-join
    *     against the corpus. This is not a missed optimization: with N
    *     probe values, a file with no true match still Bloom-hits with
    *     probability 1-(1-fpp)^N → 1, so point probing mathematically
    *     cannot prune large batches — the honest large-batch cost is
    *     one column-pruned scan of the corpus fingerprints (16 bytes/row
    *     at any scale), which column pruning + the one-column projection
    *     keep far below a data scan. */
  def dedupAppend(corpus: graft.table.GraftTable, batch: DataFrame,
      idCol: String, textCol: String): Long = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("fingerprint").orderBy(col(idCol))
    // checkpoint: the batch feeds the probe's driver jobs, the
    // anti-join, and the append — without it the window re-runs per use
    val firsts = batch
      .withColumn("fingerprint", TextFunctions.fingerprint_md5(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .localCheckpoint()
    try {
      if (!corpus.exists)
        try corpus.create(firsts.schema,
          properties = Map("graft.bloom.columns" -> "fingerprint"))
        catch {
          // lost a cold-start create race — the winner's table (same
          // schema, same properties) is the one to ingest into
          case e: IllegalArgumentException if corpus.exists => ()
        }
      val fps = firsts.select(col("fingerprint"))
      val smallBatch = firsts
        .limit(graft.table.MergeInto.MaxKeyProbeValues + 1).count() <=
        graft.table.MergeInto.MaxKeyProbeValues
      // The probe-then-append pair is a compare-and-swap, not
      // check-then-act: the append publishes only if the corpus tip is
      // still the snapshot the membership probe read (expectedParent).
      // Two concurrent ingestion loops can both pass the probe for the
      // same fingerprint; without the guard both appends would land and
      // the corpus's dedup invariant would silently break. The loser
      // re-probes against the winner's tip — its now-duplicate rows
      // drop out in the anti-join — and retries.
      //
      // An EMPTY chain (cold start: create() ran but nothing committed
      // yet) is guarded too, via casParent's parentless assertion — a
      // plain `expectedParent = tip` would pass None and skip the check,
      // so two loops racing the very first batch would both append.
      var attempt = 0
      while (true) {
        attempt += 1
        if (attempt > 20) throw new IllegalStateException(
          s"dedupAppend contention on ${corpus.location}")
        val tip = corpus.latestSnapshotId
        val existing =
          (if (smallBatch) corpus.readForKeys(fps, Seq("fingerprint"))
           else corpus.read())
            .select("fingerprint").distinct()
        val fresh = firsts.join(existing, Seq("fingerprint"), "left_anti")
          .localCheckpoint()
        try {
          val n = fresh.count()
          if (n == 0) return 0L
          try {
            corpus.append(fresh,
              expectedParent = graft.table.GraftTable.casParent(tip))
            return n
          } catch {
            case _: java.util.ConcurrentModificationException => // re-probe
          }
        } finally fresh.unpersist(blocking = false)
      }
      0L // unreachable — loop exits via return or throw
    } finally firsts.unpersist(blocking = false)
  }

  /** Exact dedup keeping whole rows: first row per fingerprint by id. */
  def exactRows(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    docs.withColumn("__fp", TextFunctions.fingerprint_md5(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** Distinct k-shingle sets per doc: (id, sh). Shared prep for the
    * MinHash paths — tokenized and shingled exactly once.
    *
    * The result is LAZILY materialized (localCheckpoint) rather than left
    * as lineage: downstream plans reference it from several places (the
    * signature aggregate + both sides of the candidate-verification
    * joins), and Catalyst's generate/constraint filter inference
    * substitutes the full tokenize→shingle expression into every inferred
    * predicate — measured 3-4 redundant per-row evaluations of the most
    * expensive expression in the engine. Behind the materialization
    * barrier each consumer reads the computed arrays (spill-backed, one
    * corpus-sized pass) and the inferred filters degrade to cheap array
    * ops. */
  private def shingledDocs(docs: DataFrame, idCol: String,
      textCol: String, shingleK: Int): DataFrame =
    docs
      .select(col(idCol).as("id"),
        TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("id"), array_distinct(
        TextFunctions.shinglesFromTokens(col("__toks"), shingleK)).as("sh"))
      .localCheckpoint(false)

  /** Per-doc MinHash signatures (id, sig: array<bigint>) via the native
    * one-buffer aggregate: shingle hashes are EXPLODED to rows and the
    * signature is a single groupBy aggregate with map-side partial combine
    * — each shingle is tokenized and hashed exactly once. (The per-row
    * column formulation this replaces evaluated 64 array_min columns, each
    * re-running the whole shingle pipeline — Catalyst cannot CSE across
    * them; measured 400× slower at sf0.1.) */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 64): DataFrame =
    signaturesOf(shingledDocs(docs, idCol, textCol, shingleK), numHashes)

  private def signaturesOf(shingled: DataFrame, numHashes: Int): DataFrame =
    shingled.select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"), hash(col("s")).cast("long").as("h"))
      .groupBy(col("id"))
      .agg(graft.functions.AggExpressions.minhash_sig(col("h"), numHashes)
        .as("sig"))

  /** MinHash+LSH near-duplicate pairs: signatures are cut into `bands`
    * bands of numHashes/bands rows; docs sharing any band bucket become
    * candidates; candidates are verified with exact shingle-set Jaccard and
    * kept at `threshold`. Returns (id_a, id_b, jaccard) with id_a < id_b.
    *
    * Shape (the part that matters at 100 TB): shingle hashes are EXPLODED
    * to rows and the signature is one groupBy-min over 64 cheap integer
    * permutations — each shingle is tokenized/hashed exactly once, one
    * shuffle total. (The naive all-column formulation recomputes the
    * shingle pipeline per signature element and again per band — ~1000×
    * duplicated work that Catalyst cannot CSE across explode boundaries;
    * measured 400× slower at sf0.1.) Candidate pairs live as slim id pairs;
    * shingle sets are re-joined only for the (tiny) verification step. */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    val rows = numHashes / bands

    val shingled = shingledDocs(docs, idCol, textCol, shingleK)

    // signature via the native one-buffer MinHash aggregate (single pass,
    // single aggregate expression, map-side partial combine)
    val sig = signaturesOf(shingled, numHashes)

    // band key = hash of the band's signature slice; slim (id, band, bh) rows
    val banded = sig.select(col("id"),
      explode(array((0 until bands).map { bd =>
        struct(lit(bd).as("band"),
          xxhash64(lit(bd), slice(col("sig"), bd * rows + 1, rows)).as("bh"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bh"))

    val cand = banded.as("l")
      .join(banded.as("r"), col("l.band") === col("r.band") &&
        col("l.bh") === col("r.bh") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    // exact verification: re-attach shingle sets for candidates only
    cand
      .join(shingled.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shingled.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", jaccardExpr(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** exact Jaccard of two shingle arrays (as sets): |A∩B| / (|A|+|B|-|A∩B|)
    * with a single double division of exact ints — bit-identical in any
    * engine that mirrors the expression. */
  def jaccardExpr(a: Column, b: Column): Column = {
    val ia = array_distinct(a)
    val ib = array_distinct(b)
    val inter = size(array_intersect(ia, ib))
    inter.cast("double") / (size(ia) + size(ib) - inter).cast("double")
  }

  /** SimHash near-duplicate pairs: 64-bit simhash per doc (native Catalyst
    * expression), banded into four 16-bit chunks (pigeonhole: hamming ≤ 3
    * ⇒ at least one identical chunk), verified by bit_count(xor) ≤ maxDist.
    * Returns (id_a, id_b, hamming). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    // materialization barrier: both sides of the banded self-join share
    // one computed copy of the per-doc simhash (see shingledDocs)
    val withSim = docs.select(col(idCol).as("id"),
      HashExpressions.simhash64(TextFunctions.tokens(col(textCol))).as("sim"))
      .localCheckpoint(false)

    val banded = withSim.select(col("id"), col("sim"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sim"), b * 16).bitwiseAND(lit(0xffffL)).as("chunk"))
      }: _*)).as("bk"))
      .select(col("id"), col("sim"), col("bk.band"), col("bk.chunk"))

    val l = banded.select(col("band"), col("chunk"), col("id").as("id_a"),
      col("sim").as("sim_a"))
    val r = banded.select(col("band"), col("chunk"), col("id").as("id_b"),
      col("sim").as("sim_b"))
    l.join(r, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }

  /** Blocked exact n-gram Jaccard: pairs are generated only within a block
    * (same language + length bucket — near-dups share both), then scored
    * exactly. Fully SQL-expressible, so oracle-checkable end to end. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, lenCol: String, shingleK: Int = 3,
      threshold: Double = 0.5, lenBucket: Int = 100): DataFrame = {
    // Shape: intersections are computed by exploding distinct shingles to
    // rows and counting shared (block, shingle) matches — one equi-join +
    // one groupBy, all linear in Σ|A∩B|. (The per-pair array_intersect
    // formulation gets its verify filter pushed into the join condition,
    // where Spark evaluates the intersect up to 4× per candidate pair with
    // no subexpression elimination — measured ~20× slower at sf0.1.)
    // Pairs with empty intersection can't reach any threshold > 0, so
    // dropping them implicitly preserves the output exactly.
    require(threshold > 0, "jaccardPairs requires a positive threshold")
    // localCheckpoint: same materialization-barrier rationale as
    // shingledDocs — both self-join sides share one computed copy and the
    // generate/constraint-inferred filters stop re-running the shingle
    // pipeline per row inside the scan
    val prep = docs
      .select(col(idCol).as("id"),
        TextFunctions.tokens(col(textCol)).as("__toks"),
        col(langCol).as("block_lang"),
        // floor-div: double-division + CAST truncates in Spark but ROUNDS
        // in DuckDB — x.5 bucket boundaries would diverge between engines
        floor(col(lenCol) / lenBucket).as("block_len"))
      .select(col("id"), array_distinct(
        TextFunctions.shinglesFromTokens(col("__toks"), shingleK)).as("da"),
        col("block_lang"), col("block_len"))
      .withColumn("n", size(col("da")))
      .localCheckpoint(false)

    val ex = prep.select(col("block_lang"), col("block_len"), col("id"),
      col("n"), explode(col("da")).as("s"))
    val inter = ex.as("a")
      .join(ex.as("b"),
        col("a.block_lang") === col("b.block_lang") &&
          col("a.block_len") === col("b.block_len") &&
          col("a.s") === col("b.s") &&
          col("a.id") < col("b.id") &&
          // size prefilter: Jaccard >= t implies sizes within factor 1/t
          col("b.n") <= col("a.n") / threshold &&
          col("a.n") <= col("b.n") / threshold)
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .agg(count(lit(1)).as("inter"))

    inter
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Connected components over near-duplicate pairs → duplicate GROUPS
    * (cluster id = smallest member id), the step that turns pairwise
    * near-dup output into per-document keep/drop decisions.
    *
    * Iterated min-label propagation: every node's label becomes the min
    * of its own and its neighbors' labels; fixpoint in O(cluster
    * diameter) rounds — near-dup clusters are dense, so diameter is tiny
    * regardless of corpus size. Each round is one equi-join + one
    * map-side-combining min aggregate (no all-pairs anything), and the
    * label frame is materialized per round (localCheckpoint) so lineage
    * stays flat across iterations — the standard large-graph CC recipe
    * on Spark. Only nodes that appear in `pairs` are labeled; singleton
    * docs need no cluster decision. */
  def clusters(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxRounds: Int = 50): DataFrame = {
    val e = pairs.select(col(aCol).cast("long").as("src"),
      col(bCol).cast("long").as("dst"))
    val edges = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(false)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node")).localCheckpoint(false)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      round += 1
      val viaNbr = edges
        .join(labels.select(col("node").as("dst"), col("lbl")), "dst")
        .select(col("src").as("node"), col("lbl"))
      val next = viaNbr.union(labels)
        .groupBy("node").agg(min(col("lbl")).as("lbl"))
        .localCheckpoint(false)
      // labels only ever decrease → convergence check is a cheap join on
      // the two materialized frames
      changed = next.as("n")
        .join(labels.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.lbl") < col("o.lbl")).count()
      labels = next
    }
    require(changed == 0,
      s"clusters did not converge in $maxRounds rounds (pathological graph?)")
    labels.select(col("node").as("id"), col("lbl").as("cluster_id"))
  }

  /** Cross-document repeated-span detection (the "exact substring
    * dedup" signal of Lee et al. 2022, at w-token granularity): for each
    * document, how much of it consists of w-token spans that also occur
    * in ANOTHER document. Returns one row per input doc:
    * (id, n_spans, n_shared, shared_frac) where n_spans counts the doc's
    * DISTINCT spans, n_shared those of them occurring in ≥ 2 docs.
    * Docs shorter than w tokens have 0 spans (and frac 0.0).
    *
    * Scale shape: spans are keyed by a 64-bit token hash (engine-portable
    * — the oracle mirrors it as a 16-hex md5 prefix) so shuffles carry
    * fixed 8-byte keys, never the span text. The per-doc DISTINCT is
    * computed MAP-SIDE by a native hash-set expression
    * (`DistinctSpanHashes`) before anything crosses the wire, and the
    * span stream crosses the wire ONCE: one groupBy(h) computes the
    * shared-span set (h in ≥ 2 docs — a small fraction of all spans in
    * real corpora), which is then BROADCAST as a semi-join build side so
    * marking each doc's shared spans is map-side; the per-doc rollup
    * partial-aggregates before its doc-keyed exchange, and n_spans never
    * explodes at all (it is `size(hs)` summed per doc). The old shape
    * shuffled the full span stream twice more (join-back on h, then the
    * doc rollup on unaggregated span rows) — the r7 10× ratio 2.9 curve.
    * Falls back to a shuffle semi-join when the shared set exceeds
    * `broadcastSharedMax` (boilerplate-heavy corpora), which is the old
    * cost, never worse. A 64-bit collision merges two spans for every
    * engine identically, so the result stays oracle-exact even in the
    * astronomically-unlikely collision case. */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 8, broadcastSharedMax: Long = 4L * 1000 * 1000): DataFrame = {
    import graft.functions.HashExpressions.distinct_span_hashes
    import graft.functions.TextFunctions.tokens
    val toks = tokens(col(textCol))
    // base is checkpointed: tokenize + span-hash is the dominant CPU
    // cost on a large corpus and base feeds BOTH passes (the shared-set
    // aggregation and the per-doc rollup) — unmaterialized, it ran twice
    // and the Scale100 100× tier paid ~2× wall for it (measured 10.7 s →
    // 5.2 s with the checkpoint). The blocks CANNOT be unpersisted here —
    // the returned lazy plan references them; they free via the
    // ContextCleaner once the caller drops the result.
    val base = docs.select(col(idCol).as("id"),
      distinct_span_hashes(toks, w).as("hs"))
      .localCheckpoint(false)
    // the ONE span-keyed shuffle; checkpointed so the size probe and the
    // membership join reuse the aggregation instead of re-running it
    val shared = base.select(explode(col("hs")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("nd"))
      .filter(col("nd") > 1).select("h").localCheckpoint()
    val sharedSide =
      if (shared.count() <= broadcastSharedMax) broadcast(shared)
      else shared
    // ONE per-doc rollup computes both counts from the same exploded
    // stream: explode_outer keeps short/null-text docs (null h → 0
    // spans), the broadcast LEFT join marks shared spans in place, and
    // n_spans rides the stream for free (it already flows through the
    // membership join) — one doc-keyed exchange, no nSpans⋈nShared join.
    base.select(col("id"), explode_outer(col("hs")).as("h"))
      .join(sharedSide.withColumn("__s", lit(1L)), Seq("h"), "left")
      .groupBy("id")
      .agg(count(col("h")).as("n_spans"),
        coalesce(sum(col("__s")), lit(0L)).as("n_shared"))
      .withColumn("shared_frac",
        when(col("n_spans") === 0L, lit(0.0))
          .otherwise(col("n_shared").cast("double") /
            col("n_spans").cast("double")))
      .select("id", "n_spans", "n_shared", "shared_frac")
  }

  /** Embedding near-duplicates via exact quantized cosine over candidate
    * pairs. `bucketCol` optionally pre-blocks (e.g. LSH bucket); without it
    * this is all-pairs and should only run on samples/blocks. */
  def embeddingNearDups(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bucket: Option[Column] = None): DataFrame = {
    import graft.functions.VectorFunctions._
    // norms are per-ROW (computed once before the join), not per-pair:
    // the pair side then pays only the dot product — same expression
    // tree as cosineQ, so the doubles are bit-identical
    val q = vecs.select(col(idCol).as("id"),
      quantize(col(vecCol)).as("q"),
      bucket.getOrElse(lit(0)).as("bk"))
      .withColumn("nsq", normSqQ(col("q")))
    val l = q.select(col("bk"), col("id").as("id_a"), col("q").as("q_a"),
      col("nsq").as("nsq_a"))
    val r = q.select(col("bk"), col("id").as("id_b"), col("q").as("q_b"),
      col("nsq").as("nsq_b"))
    l.join(r, Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", dotQ(col("q_a"), col("q_b")).cast("double") /
        (sqrt(col("nsq_a").cast("double")) * sqrt(col("nsq_b").cast("double"))))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
      .dropDuplicates("id_a", "id_b")
  }
}

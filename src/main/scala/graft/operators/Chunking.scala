package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-window chunking for LLM training-data preparation: split each
  * document into fixed-size token windows (optionally overlapping — the
  * context-window prep shape), and exact-dedup at chunk granularity with
  * global keep-first-occurrence semantics (the C4/RefinedWeb paragraph-
  * dedup approach, on deterministic token boundaries since the corpus
  * carries no structural separators).
  *
  * Scale shape: chunking is MAP-ONLY (one Generate per doc, no shuffle);
  * chunk dedup is explode → one hash shuffle on the chunk fingerprint →
  * join back on the same key → one per-doc rollup — all linear in corpus
  * size, no doc-pair product anywhere. */
object Chunking {

  import graft.functions.TextFunctions.tokens

  private def tokCol(textCol: String): Column = tokens(col(textCol))

  /** ONE shared windowing pipeline (tokenize → drop empty docs → window
    * starts every `stride` → per-window slices): both the public chunk()
    * and chunkDedup() consume it, so the empty-doc filter and the
    * window-boundary arithmetic — which the oracles pin — can never
    * drift between them. Emits one row per window: (doc_id, chunk_idx,
    * chunk_text = the full chunkSize-token window, owned_text = the
    * window's first `stride` tokens (≤ stride for the last window),
    * n_tokens = the window's actual length). */
  private def windows(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(stride > 0 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride")
    docs
      .select(col(idCol).as("doc_id"), tokCol(textCol).as("t"))
      // normalize("") splits to [""] — treat as empty, not a 1-token doc
      .filter(size(col("t")) > 0 && col("t").getItem(0) =!= "")
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0),
          floor((size(col("t")) - 1) / stride).cast("int"))).as("i"))
      .select(col("doc_id"),
        col("i").cast("long").as("chunk_idx"),
        array_join(slice(col("t"), col("i") * stride + 1, lit(chunkSize)),
          " ").as("chunk_text"),
        array_join(slice(col("t"), col("i") * stride + 1, lit(stride)),
          " ").as("owned_text"),
        least(lit(chunkSize), size(col("t")) - col("i") * stride)
          .cast("long").as("n_tokens"))
  }

  /** Explode `docs` into token windows of `chunkSize`, starting every
    * `stride` tokens (stride < chunkSize ⇒ overlapping windows; stride ==
    * chunkSize ⇒ a partition of the doc). The last window of a doc may be
    * short (`n_tokens` < chunkSize). Output: (doc_id, chunk_idx,
    * chunk_text, n_tokens), one row per window, empty docs dropped. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame =
    windows(docs, idCol, textCol, chunkSize, stride)
      .select("doc_id", "chunk_idx", "chunk_text", "n_tokens")

  /** Exact chunk-level dedup, keep-first: partition every doc into
    * non-overlapping `chunkSize`-token chunks, keep each distinct chunk
    * text only at its globally FIRST occurrence (ordered by (doc_id,
    * chunk_idx)), drop every later repeat, and reassemble the surviving
    * chunks per doc. Output: (doc_id, n_chunks, n_kept, clean_text) — a
    * doc whose every chunk appeared earlier elsewhere survives with
    * n_kept = 0 and empty clean_text (the caller filters).
    *
    * Non-overlapping convenience form: see the stride overload below for
    * the full pinned semantics. */
  def chunkDedup(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int): DataFrame =
    chunkDedup(docs, idCol, textCol, chunkSize, chunkSize)

  /** Overlapping-window chunk dedup (stride ≤ chunkSize). PINNED
    * SEMANTICS — the dedup DECISION and the DROP region are different
    * granularities, which is what makes overlap sound:
    *
    *   - the duplicate test keys on the FULL `chunkSize`-token window
    *     text (more context ⇒ fewer false dup hits than stride-sized
    *     pieces would give);
    *   - a dropped window removes only its OWNED region — the `stride`
    *     tokens starting at its offset (the last window's owned region
    *     runs to doc end, still ≤ stride tokens, since a later start
    *     would have spawned another window). Every token is owned by
    *     exactly ONE window, so overlapping windows can never
    *     double-drop shared tokens: duplicated content is removed
    *     exactly where a duplicate window STARTS, and tokens past its
    *     first stride survive through their own (kept) owner windows —
    *     the Lee et al. 2022 exact-substring marking style, at stride
    *     granularity.
    *
    * With stride == chunkSize the owned region IS the window, reducing
    * exactly to the non-overlapping dedup above. n_chunks/n_kept count
    * WINDOWS (dedup decisions), not tokens.
    *
    * The winner per fingerprint is `min(struct(doc_id, chunk_idx))` — a
    * total order (doc ids unique), so the result is deterministic and
    * engine-portable; the md5 fingerprint only routes the shuffle, the
    * keep decision compares the ORDER key, so a collision cannot flip
    * which occurrence survives — it could only merge two distinct texts
    * (astronomically unlikely, and identically in any engine). */
  def chunkDedup(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    val chunks = windows(docs, idCol, textCol, chunkSize, stride)
      .withColumn("h", md5(col("chunk_text")))
    val winners = chunks.groupBy("h")
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("w"))
    val kept = chunks.join(winners, "h")
      .filter(col("w.doc_id") === col("doc_id") &&
        col("w.chunk_idx") === col("chunk_idx"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_idx"),
            col("owned_text")))),
          x => x.getField("owned_text")), " ").as("clean_text"))
    val totals = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"))
    totals.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}

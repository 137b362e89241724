package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{HashExpressions, TextFunctions}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // corpus with planted near-duplicates and exact duplicates
  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 0
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (3L, "completely different content about spark query engines and columnar formats"),
    (4L, "spark query engines and columnar formats are a completely different topic"), // shares tokens w/ 3
    (5L, "THE  Quick   brown fox jumps over the lazy dog near the river bank today")) // 0 modulo case/space
    .toDF("doc_id", "text")

  test("repeatedSpans scores cross-doc 8-token span sharing") {
    val withShort = docs.unionByName(
      Seq((6L, "too short for any span")).toDF("doc_id", "text"))
    val r = Dedup.repeatedSpans(withShort, "doc_id", "text", w = 8)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(0L)._3 === 1.0)            // exact dup of 2 and 5: all shared
    assert(r(1L)._1 === 7L)             // 14 tokens -> 7 distinct spans
    assert(r(1L)._2 === 6L)             // all but the last-word span shared
    assert(r(3L)._3 === 0.0)            // no span shared with doc 4
    assert(r(6L) === ((0L, 0L, 0.0)))   // short doc: no spans at all
    // the shuffle-semi-join fallback (shared set over the broadcast cap)
    // computes the identical result
    val fb = Dedup.repeatedSpans(withShort, "doc_id", "text", w = 8,
      broadcastSharedMax = 0L).orderBy("id").collect()
    assert(fb === Dedup.repeatedSpans(withShort, "doc_id", "text", w = 8)
      .orderBy("id").collect())
  }

  test("exact dedup groups identical normalized content") {
    val d = Dedup.exact(docs, "doc_id", "text").collect()
    // 0, 2, 5 collapse (5 differs only in case/whitespace)
    val group = d.filter(_.getAs[Long]("dup_count") == 3)
    assert(group.length === 1)
    assert(group.head.getAs[Long]("keep_id") === 0L)
    assert(d.length === 4) // 4 distinct contents
  }

  test("exactRows keeps exactly one row per content, the lowest id") {
    val rows = Dedup.exactRows(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(rows === Array(0L, 1L, 3L, 4L))
  }

  test("minhash LSH finds planted near-duplicates, skips unrelated docs") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      shingleK = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // near-dup pair found
    assert(pairs.contains((0L, 2L))) // exact dup found
    assert(pairs.contains((0L, 5L))) // normalization-equal found
    assert(!pairs.exists(p => Set(p._1, p._2).intersect(Set(0L, 1L, 2L, 5L)).nonEmpty
      && Set(p._1, p._2).intersect(Set(3L, 4L)).nonEmpty)) // groups don't mix
  }

  test("minhash signature approximates true jaccard") {
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", 3, 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def simEst(a: Long, b: Long): Double =
      sig(a).zip(sig(b)).count { case (x, y) => x == y } / 64.0
    assert(simEst(0L, 2L) === 1.0) // identical docs → identical signatures
    assert(simEst(0L, 1L) > 0.5) // near-dups → high estimate
    assert(simEst(0L, 3L) < 0.3) // unrelated → low estimate
  }

  test("simhash pairs finds near-dups at small hamming distance") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 2L)))
    assert(pairs.contains((0L, 5L)))
    assert(!pairs.contains((0L, 3L)))
    // SimHash sensitivity scales with length: a 1-word change in a ~140-token
    // doc stays within Hamming 3 (in a 14-token doc it flips ~6 bits — by
    // design, that's a 7% content change, not a near-dup).
    val phrase = "large scale data processing with columnar execution engines and vectorized readers "
    val long1 = phrase * 10
    val long2 = (phrase * 9) + phrase.replace("vectorized", "modified")
    val longDocs = Seq((10L, long1), (11L, long2)).toDF("doc_id", "text")
    val longPairs = Dedup.simhashPairs(longDocs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(longPairs.contains((10L, 11L)))
  }

  test("simhash of identical token multisets is identical, and stable") {
    val sims = docs.select(
      HashExpressions.simhash64(TextFunctions.tokens(col("text"))).as("s"))
      .as[Long].collect()
    assert(sims(0) === sims(2))
    assert(sims(0) === sims(5))
    assert(sims(0) !== sims(3))
    // stability: recompute → same values (fixed seed)
    val again = docs.select(
      HashExpressions.simhash64(TextFunctions.tokens(col("text"))).as("s"))
      .as[Long].collect()
    assert(sims === again)
  }

  test("blocked jaccard pairs computes exact scores") {
    val blocked = docs
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
    val pairs = Dedup.jaccardPairs(blocked, "doc_id", "text", "lang",
      "n_chars", shingleK = 3, threshold = 0.9, lenBucket = 1000)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs(0L -> 2L) === 1.0)
    assert(pairs(0L -> 5L) === 1.0)
  }

  test("embedding near-dup finds planted identical vector") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.5f)),
      (1L, Array(1.0f, 0.001f, 0.5f)), // near-identical to 0
      (2L, Array(-1.0f, 0.2f, -0.5f))) // far
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(vecs, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("clusters: connected components over pair lists, transitively closed") {
    // 1-2-3 form a chain (1-2, 2-3; 1-3 NOT given) + 7-8 + isolated pair 5-6
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L), (5L, 6L))
      .toDF("id_a", "id_b")
    val out = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, // chain closed: 3 joins 1
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 7L))
  }

  test("clusters converge on a long path (diameter > 1 round)") {
    // path 0-1-2-...-9: min label must propagate the whole way
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size === 10)
    assert(out.values.toSet === Set(0L))
  }

  test("hashSplit: deterministic, id-stable under corpus growth, fractions honored") {
    import graft.operators.Sampling
    val small = (0L until 1000L).toDF("id")
    val grown = (0L until 5000L).toDF("id")
    val splits = Seq("train" -> 0.8, "test" -> 0.2)
    val a = Sampling.hashSplit(small, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(grown, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // growing the corpus never moves an existing row's split
    assert(a.forall { case (id, s) => b(id) == s })
    // fractions approximately honored (hash uniformity)
    val trainFrac = a.values.count(_ == "train").toDouble / a.size
    assert(trainFrac > 0.75 && trainFrac < 0.85, s"train frac $trainFrac")
    // bad fractions rejected
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(small, "id", Seq("a" -> 0.5, "b" -> 0.6))
    }
  }

  test("rolling_hash64 expression: deterministic, content-sensitive, codegen-safe") {
    val fps = docs.select(TextFunctions.fingerprint64(col("text")).as("fp"))
      .as[Long].collect()
    assert(fps(0) === fps(2) && fps(0) === fps(5))
    assert(fps(0) !== fps(1))
    // matches the direct JVM computation (codegen path == eval path)
    val direct = HashExpressions.RollingHash64.hash(
      "the quick brown fox jumps over the lazy dog near the river bank today"
        .getBytes("UTF-8"))
    assert(fps(0) === direct)
  }

  test("chunk: overlapping token windows with exact boundaries") {
    // 10 tokens, size 4, stride 3 -> starts at 0,3,6,9
    val d = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val r = Chunking.chunk(d, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_text", "n_tokens")
      .as[(Long, String, Long)].collect()
    assert(r === Array(
      (0L, "a b c d", 4L), (1L, "d e f g", 4L),
      (2L, "g h i j", 4L), (3L, "j", 1L)))
    // empty and whitespace-only docs vanish; short docs yield one chunk
    val edge = Seq((1L, ""), (2L, "   "), (3L, "x y")).toDF("doc_id", "text")
    val e = Chunking.chunk(edge, "doc_id", "text", 4, 4)
      .select("doc_id", "chunk_text", "n_tokens")
      .as[(Long, String, Long)].collect()
    assert(e === Array((3L, "x y", 2L)))
  }

  test("chunkDedup keeps first occurrence globally, reassembles in order") {
    val d = Seq(
      (1L, "a b c d w x y z"),   // chunks: "a b c d", "w x y z"
      (2L, "a b c d p q r s"),   // first chunk repeats doc 1
      (3L, "w x y z a b c d"))   // both chunks repeat earlier docs
      .toDF("doc_id", "text")
    val r = Chunking.chunkDedup(d, "doc_id", "text", chunkSize = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(r === Array(
      (1L, 2L, 2L, "a b c d w x y z"),
      (2L, 2L, 1L, "p q r s"),
      (3L, 2L, 0L, "")))
    // keep-first is ordered WITHIN a doc too: a chunk repeated inside
    // one doc survives only at its first index
    val self = Seq((9L, "m n o p m n o p")).toDF("doc_id", "text")
    val s9 = Chunking.chunkDedup(self, "doc_id", "text", 4)
      .as[(Long, Long, Long, String)].collect()
    assert(s9 === Array((9L, 2L, 1L, "m n o p")))
  }

  test("dedupAppend: re-arrivals drop against the corpus TABLE, novel " +
      "docs land, and the membership probe is Bloom-file-pruned") {
    import graft.table.GraftTable
    val t = GraftTable(spark, tmpDir("dedup-append") + "/t")
    def mk(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, s"content number $i")).toDF("doc_id", "text")
    assert(Dedup.dedupAppend(t, mk(0, 100).coalesce(1),
      "doc_id", "text") === 100)
    assert(Dedup.dedupAppend(t, mk(100, 200).coalesce(1),
      "doc_id", "text") === 100)
    assert(Dedup.dedupAppend(t, mk(200, 300).coalesce(1),
      "doc_id", "text") === 100)
    assert(t.liveFiles().size >= 3)
    // a mixed batch: one re-arrival (content 5 under a new id), one novel
    val batch = Seq((9999L, "content number 5"), (10000L, "brand new text"))
      .toDF("doc_id", "text")
    assert(Dedup.dedupAppend(t, batch, "doc_id", "text") === 1)
    assert(t.read().count() === 301)
    assert(t.read().filter($"doc_id" === 9999L).count() === 0)
    assert(t.read().filter($"doc_id" === 10000L).count() === 1)
    // within-batch keep-first: the same novel text twice keeps min id
    val twin = Seq((20001L, "twin text"), (20000L, "twin text"))
      .toDF("doc_id", "text")
    assert(Dedup.dedupAppend(t, twin, "doc_id", "text") === 1)
    assert(t.read().filter($"doc_id" === 20000L).count() === 1)
    // Bloom file pruning: fingerprints are uniform so min/max ranges all
    // span the hash space — only the Bloom bitset can prune; a 1-key
    // probe must read fewer rows than the whole corpus
    import graft.functions.TextFunctions.fingerprint_md5
    val probe = Seq("content number 5").toDF("text")
      .select(fingerprint_md5($"text").as("fingerprint"))
    val pruned = t.readForKeys(probe, Seq("fingerprint")).count()
    assert(pruned < t.read().count(),
      s"probe read $pruned rows — no file was pruned")
  }

  test("overlapping chunkDedup: dup test on full windows, drop at owned-" +
      "stride granularity, no double-drop of shared overlap") {
    // chunkSize=4, stride=2: windows start every 2 tokens, each OWNS its
    // first 2 tokens (the last window owns to doc end).
    // Doc 1: a b c d e f — windows (abcd)(cdef)(ef); all kept.
    // Doc 2 starts with doc 1's first WINDOW (a b c d) then diverges:
    // only that window is a dup, so only its owned "a b" drops; "c d"
    // survives through its own owner window (cdpq — unique).
    val d = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d p q r s"))
      .toDF("doc_id", "text")
    val r = Chunking.chunkDedup(d, "doc_id", "text", chunkSize = 4,
        stride = 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(r === Array(
      (1L, 3L, 3L, "a b c d e f"),
      (2L, 4L, 3L, "c d p q r s")))

    // stride == chunkSize reduces exactly to the non-overlapping dedup
    val base = Seq((1L, "a b c d w x y z"), (2L, "a b c d p q r s"))
      .toDF("doc_id", "text")
    val nonOv = Chunking.chunkDedup(base, "doc_id", "text", 4)
      .orderBy("doc_id").collect()
    val strided = Chunking.chunkDedup(base, "doc_id", "text", 4, 4)
      .orderBy("doc_id").collect()
    assert(nonOv === strided)

    // an identical FULL doc dedups to nothing: every window is a dup,
    // every owned region drops — exactly full-coverage, never more
    val copy = Seq((1L, "a b c d e f"), (5L, "a b c d e f"))
      .toDF("doc_id", "text")
    val c = Chunking.chunkDedup(copy, "doc_id", "text", 4, 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(c === Array(
      (1L, 3L, 3L, "a b c d e f"),
      (5L, 3L, 0L, "")))
  }
}

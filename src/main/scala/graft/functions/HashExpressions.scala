package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.GraftSqlGlue
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the content-hashing hot path
  * (fingerprinting, SimHash). Native expressions rather than Scala UDFs so
  * they stay inside whole-stage codegen row processing (no SerDe per row)
  * and are visible to the optimizer — the preference order the build
  * follows: compose built-ins > native Expression > UDF.
  */
object HashExpressions {

  /** FNV-1a 64-bit rolling content hash of a string — the document
    * fingerprint primitive. Deterministic, allocation-free, codegen'd. */
  case class RollingHash64(child: Expression) extends UnaryExpression
      with ExpectsInputTypes {
    override def dataType: DataType = LongType
    override def inputTypes: Seq[GraftSqlGlue.SqlAbstractDataType] = Seq(StringType)
    override def prettyName: String = "rolling_hash64"

    override def nullSafeEval(input: Any): Any =
      RollingHash64.hash(input.asInstanceOf[UTF8String].getBytes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.NativeOps.rollingHash64($c.getBytes())")

    override protected def withNewChildInternal(c: Expression): RollingHash64 =
      copy(child = c)
  }

  object RollingHash64 {
    /** FNV-1a 64-bit over UTF-8 bytes. */
    def hash(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL)
        h *= 0x100000001b3L
        i += 1
      }
      h
    }
  }

  /** 64-bit SimHash over a token array: each token is hashed to 64 bits;
    * per bit, tokens vote +1/-1; the sign vector is the fingerprint.
    * Near-duplicate docs differ in few bits (small Hamming distance). One
    * pass, O(tokens).
    *
    * The token hash is the first 8 bytes (big-endian) of MD5(token) — a
    * deliberately engine-portable choice: any engine with an md5() builtin
    * reproduces the fingerprint bit-for-bit, so the whole near-dup operator
    * is oracle-checkable end to end (an engine-private hash like xxhash64
    * would make the output unverifiable outside Spark). */
  case class SimHash64(child: Expression) extends UnaryExpression
      with ExpectsInputTypes {
    override def dataType: DataType = LongType
    override def inputTypes: Seq[GraftSqlGlue.SqlAbstractDataType] = Seq(ArrayType(StringType))
    override def prettyName: String = "simhash64"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      SimHash64.ofTokens(arr)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.NativeOps.simhash64($c)")

    override protected def withNewChildInternal(c: Expression): SimHash64 =
      copy(child = c)
  }

  /** 64-bit md5-prefix point hash of a string — the same engine-portable
    * hash [[SimHash64]] uses per token, exposed as a scalar: mirrors
    * `('0x' || substr(md5(s), 1, 16))::UBIGINT` in DuckDB-style SQL, so
    * any sketch built on it is reproducible outside Spark bit-for-bit. */
  case class Md5Hash64(child: Expression) extends UnaryExpression
      with ExpectsInputTypes {
    override def dataType: DataType = LongType
    override def inputTypes: Seq[GraftSqlGlue.SqlAbstractDataType] =
      Seq(StringType)
    override def prettyName: String = "md5_hash64"

    override def nullSafeEval(input: Any): Any =
      SimHash64.tokenHash(input.asInstanceOf[UTF8String].getBytes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.NativeOps.md5Hash64($c)")

    override protected def withNewChildInternal(c: Expression): Md5Hash64 =
      copy(child = c)
  }

  object SimHash64 {
    // one digest per thread: MessageDigest is stateful and not thread-safe,
    // and allocating per row would dominate the per-token work
    private val md5 = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

    /** first 8 bytes of MD5(bytes), big-endian — mirrors
      * ('0x' || substr(md5(s), 1, 16))::UBIGINT in DuckDB-style SQL. */
    def tokenHash(bytes: Array[Byte]): Long = {
      val digest = md5.get()
      digest.reset()
      val d = digest.digest(bytes)
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      h
    }

    def ofTokens(tokens: ArrayData): Long = {
      val counts = new Array[Int](64)
      val n = tokens.numElements()
      var i = 0
      while (i < n) {
        if (!tokens.isNullAt(i)) {
          val h = tokenHash(tokens.getUTF8String(i).getBytes)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) {
        if (counts(b) > 0) out |= (1L << b)
        b += 1
      }
      out
    }
  }

  /** k-token word shingles of a token array, space-joined: native, one
    * O(tokens·k) pass per row.
    *
    * Why native: the compositional formulation (transform over sequence +
    * slice + array_join) evaluates interpreted (higher-order functions have
    * no codegen) and re-evaluates any non-attribute input per lambda
    * iteration — and projection barriers collapse through Generate — giving
    * O(tokens²) work per doc in exactly the hot dedup paths. Measured ~30×
    * on sf0.1 documents. Semantics (short docs → one whole-doc shingle)
    * match the SQL oracle mirror exactly. */
  case class WordShingles(child: Expression, k: Int) extends UnaryExpression
      with ExpectsInputTypes {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def inputTypes: Seq[GraftSqlGlue.SqlAbstractDataType] = Seq(ArrayType(StringType))
    override def prettyName: String = "word_shingles"

    override def nullSafeEval(input: Any): Any =
      WordShingles.ofTokens(input.asInstanceOf[ArrayData], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.NativeOps.wordShingles($c, $k)")

    override protected def withNewChildInternal(c: Expression): WordShingles =
      copy(child = c)
  }

  object WordShingles {
    private val SPACE = UTF8String.fromString(" ")

    def ofTokens(tokens: ArrayData, k: Int): ArrayData = {
      val n = tokens.numElements()
      def tok(i: Int): UTF8String =
        if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8 else tokens.getUTF8String(i)
      if (n < k) {
        val parts = new Array[UTF8String](math.max(2 * n - 1, 0))
        var i = 0
        while (i < n) {
          parts(2 * i) = tok(i)
          if (i < n - 1) parts(2 * i + 1) = SPACE
          i += 1
        }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array[Any](UTF8String.concat(parts.toIndexedSeq: _*)))
      } else {
        val out = new Array[Any](n - k + 1)
        var i = 0
        while (i <= n - k) {
          val parts = new Array[UTF8String](2 * k - 1)
          var j = 0
          while (j < k) {
            parts(2 * j) = tok(i + j)
            if (j < k - 1) parts(2 * j + 1) = SPACE
            j += 1
          }
          out(i) = UTF8String.concat(parts.toIndexedSeq: _*)
          i += 1
        }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
      }
    }
  }

  /** Per-document DISTINCT w-token span hashes: slides a w-token window
    * over the token array, hashes each space-joined span to the first 8
    * bytes of its MD5 (big-endian long — the same key space as
    * substr(md5(span),1,16), so cross-engine collision semantics are
    * identical to the SQL-oracle mirror), and returns the doc's distinct
    * hash set as array<long>. Docs shorter than w tokens → empty array.
    *
    * Why native: this moves the span-dedup `distinct()` from a cluster
    * shuffle (one row per span OCCURRENCE crossing the wire, then a
    * hash-exchange to dedup) to a per-row hash set built map-side — the
    * downstream explode emits one row per distinct span, pre-deduped, and
    * the only shuffles left carry 8-byte keys. The hash itself replaces a
    * separate md5()+substring projection over exploded rows. */
  case class DistinctSpanHashes(child: Expression, w: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def inputTypes: Seq[GraftSqlGlue.SqlAbstractDataType] = Seq(ArrayType(StringType))
    override def prettyName: String = "distinct_span_hashes"

    override def nullSafeEval(input: Any): Any =
      DistinctSpanHashes.ofTokens(input.asInstanceOf[ArrayData], w)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.NativeOps.distinctSpanHashes($c, $w)")

    override protected def withNewChildInternal(c: Expression): DistinctSpanHashes =
      copy(child = c)
  }

  object DistinctSpanHashes {
    private val SPACE = UTF8String.fromString(" ")

    def ofTokens(tokens: ArrayData, w: Int): ArrayData = {
      val n = tokens.numElements()
      if (n < w)
        return new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array.empty[Any])
      def tok(i: Int): UTF8String =
        if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8 else tokens.getUTF8String(i)
      // insertion-ordered so the explode order (and thus any downstream
      // row order before sorts) is deterministic across JVMs
      val seen = new java.util.LinkedHashSet[java.lang.Long](
        math.min(n - w + 1, 1 << 16))
      val parts = new Array[UTF8String](2 * w - 1)
      var i = 0
      while (i <= n - w) {
        var j = 0
        while (j < w) {
          parts(2 * j) = tok(i + j)
          if (j < w - 1) parts(2 * j + 1) = SPACE
          j += 1
        }
        val span = UTF8String.concat(parts.toIndexedSeq: _*)
        seen.add(SimHash64.tokenHash(span.getBytes))
        i += 1
      }
      val out = new Array[Any](seen.size())
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  // ---- Column-level entry points ----

  def md5_hash64(c: Column): Column =
    GraftSqlGlue.column(Md5Hash64(GraftSqlGlue.expression(c)))

  def rolling_hash64(c: Column): Column =
    GraftSqlGlue.column(RollingHash64(GraftSqlGlue.expression(c)))

  def simhash64(tokens: Column): Column =
    GraftSqlGlue.column(SimHash64(GraftSqlGlue.expression(tokens)))

  def word_shingles(tokens: Column, k: Int): Column =
    GraftSqlGlue.column(WordShingles(GraftSqlGlue.expression(tokens), k))

  def distinct_span_hashes(tokens: Column, w: Int): Column =
    GraftSqlGlue.column(DistinctSpanHashes(GraftSqlGlue.expression(tokens), w))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.GraftSqlGlue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for intra-document repetition signals — the
  * Gopher-style repetition filters (Rae et al. 2021, table A1): documents
  * dominated by a repeated n-gram or repeated lines are boilerplate/spam
  * and get filtered before training.
  *
  * Why native: the signal needs per-document n-gram COUNTS. The relational
  * formulation (explode shingles → groupBy(doc, gram) → groupBy(doc)) pays
  * two shuffles of the exploded corpus; this expression computes the same
  * numbers in one hash-map pass per row, so the filter is map-only at any
  * corpus size — the same "keep per-doc work inside the row" argument as
  * WordShingles. CodegenFallback (a per-row hash map has no sensible
  * codegen), but the surrounding stage stays columnar and there is no
  * shuffle to amortize.
  *
  * Every output is a ratio of two exact integers with ONE final double
  * division, so any engine reproduces the value bit-for-bit (the
  * VectorFunctions.quantize portability recipe).
  */
object TextExpressions {

  /** struct(top_char_frac, dup_char_frac) for word n-grams of a token
    * array:
    *   - top_char_frac: chars covered by every occurrence of the single
    *     most frequent n-gram (ties: longer gram wins — the fraction is
    *     identical for any (count, len) tie) / total chars;
    *   - dup_char_frac: chars covered by all occurrences of all n-grams
    *     seen more than once / total chars.
    * Total chars = length of the space-joined token array (= the
    * normalized text). Docs with fewer than n tokens, or zero total
    * chars, score 0.0 on both. Gram char length includes its internal
    * separator spaces, matching `array_to_string(t[i+1:i+n], ' ')`.
    *
    * Caveat: occurrences are counted without overlap-dedup (the count ×
    * length product of Rae et al.'s description, not their char-marking
    * implementation), so under self-overlapping repeats ("a a a a") a
    * value can exceed 1.0. The signal gates small thresholds (≤ 0.2)
    * where the distinction never matters, and the product form is what
    * keeps the value reproducible in one aggregation-free SQL mirror. */
  case class NgramRepetition(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
    require(n >= 1, "n must be >= 1")

    override def dataType: DataType = StructType(Seq(
      StructField("top_char_frac", DoubleType, nullable = false),
      StructField("dup_char_frac", DoubleType, nullable = false)))
    override def inputTypes: Seq[GraftSqlGlue.SqlAbstractDataType] =
      Seq(ArrayType(StringType))
    override def prettyName: String = "ngram_repetition"

    override def nullSafeEval(input: Any): Any =
      NgramRepetition.ofTokens(input.asInstanceOf[ArrayData], n)

    override protected def withNewChildInternal(c: Expression): NgramRepetition =
      copy(child = c)
  }

  object NgramRepetition {
    def ofTokens(tokens: ArrayData, n: Int): InternalRow = {
      val nTok = tokens.numElements()
      var total = 0L
      var i = 0
      while (i < nTok) {
        if (!tokens.isNullAt(i)) total += tokens.getUTF8String(i).numChars()
        i += 1
      }
      if (nTok > 1) total += nTok - 1 // separator spaces of the joined text
      if (nTok < n || total == 0L) return InternalRow(0.0, 0.0)

      // count each n-gram; gram char length = token lens + (n-1) spaces
      val counts = new java.util.HashMap[UTF8String, Array[Long]]()
      i = 0
      while (i <= nTok - n) {
        val parts = new Array[UTF8String](2 * n - 1)
        var j = 0
        while (j < n) {
          parts(2 * j) = if (tokens.isNullAt(i + j)) UTF8String.EMPTY_UTF8
            else tokens.getUTF8String(i + j)
          if (j < n - 1) parts(2 * j + 1) = Sep
          j += 1
        }
        val gram = UTF8String.concat(parts.toIndexedSeq: _*)
        val slot = counts.get(gram)
        if (slot == null) counts.put(gram, Array(1L, gram.numChars().toLong))
        else slot(0) += 1L
        i += 1
      }

      var topCnt = 0L
      var topLen = 0L
      var dupChars = 0L
      val it = counts.values().iterator()
      while (it.hasNext) {
        val slot = it.next()
        val cnt = slot(0)
        val len = slot(1)
        if (cnt > topCnt || (cnt == topCnt && len > topLen)) {
          topCnt = cnt; topLen = len
        }
        if (cnt > 1L) dupChars += cnt * len
      }
      InternalRow(
        (topCnt * topLen).toDouble / total.toDouble,
        dupChars.toDouble / total.toDouble)
    }

    private val Sep = UTF8String.fromString(" ")
  }

  /** struct(dup_line_frac, dup_line_char_frac) over the raw text's
    * newline-split, trimmed, non-empty lines:
    *   - dup_line_frac: occurrences of lines appearing more than once /
    *     total lines;
    *   - dup_line_char_frac: chars of those occurrences / total line chars.
    * Docs with no non-empty lines score 0.0 on both. */
  case class LineRepetition(child: Expression)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

    override def dataType: DataType = StructType(Seq(
      StructField("dup_line_frac", DoubleType, nullable = false),
      StructField("dup_line_char_frac", DoubleType, nullable = false)))
    override def inputTypes: Seq[GraftSqlGlue.SqlAbstractDataType] = Seq(StringType)
    override def prettyName: String = "line_repetition"

    override def nullSafeEval(input: Any): Any =
      LineRepetition.ofText(input.asInstanceOf[UTF8String])

    override protected def withNewChildInternal(c: Expression): LineRepetition =
      copy(child = c)
  }

  object LineRepetition {
    def ofText(text: UTF8String): InternalRow = {
      val counts = new java.util.HashMap[String, Array[Long]]()
      var nLines = 0L
      var totalChars = 0L
      text.toString.split("\n", -1).foreach { raw =>
        val line = raw.trim
        if (line.nonEmpty) {
          nLines += 1
          val len = line.codePointCount(0, line.length).toLong
          totalChars += len
          val slot = counts.get(line)
          if (slot == null) counts.put(line, Array(1L, len))
          else slot(0) += 1L
        }
      }
      if (nLines == 0L) return InternalRow(0.0, 0.0)
      var dupLines = 0L
      var dupChars = 0L
      val it = counts.values().iterator()
      while (it.hasNext) {
        val slot = it.next()
        if (slot(0) > 1L) { dupLines += slot(0); dupChars += slot(0) * slot(1) }
      }
      InternalRow(
        dupLines.toDouble / nLines.toDouble,
        if (totalChars == 0L) 0.0 else dupChars.toDouble / totalChars.toDouble)
    }
  }

  // ---- Column-level entry points ----

  /** struct(top_char_frac, dup_char_frac) of word n-grams of a token array. */
  def ngram_repetition(tokens: Column, n: Int): Column =
    GraftSqlGlue.column(NgramRepetition(GraftSqlGlue.expression(tokens), n))

  /** struct(dup_line_frac, dup_line_char_frac) of a raw text column. */
  def line_repetition(text: Column): Column =
    GraftSqlGlue.column(LineRepetition(GraftSqlGlue.expression(text)))
}

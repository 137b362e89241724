package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._
  import TextExpressions._

  private def ngram(text: String, n: Int): (Double, Double) = {
    val r = Seq(text).toDF("text")
      .select(ngram_repetition(TextFunctions.tokens(col("text")), n).as("s"))
      .select("s.top_char_frac", "s.dup_char_frac").head()
    (r.getDouble(0), r.getDouble(1))
  }

  test("ngram_repetition counts exact top and duplicate coverage") {
    // tokens [a b a b a b]: bigrams "a b"×3, "b a"×2, total chars 11
    val (top2, dup2) = ngram("a b a b a b", 2)
    assert(top2 === 9.0 / 11.0)
    assert(dup2 === (3 * 3 + 2 * 3).toDouble / 11.0)
    // all 5-grams distinct -> no duplicate coverage
    val (top5, dup5) = ngram("a b a b a b", 5)
    assert(top5 === 9.0 / 11.0) // "a b a b a" count 1, len 9
    assert(dup5 === 0.0)
  }

  test("ngram_repetition tie-break prefers the longer gram") {
    // "xx yy zz": all bigrams count 1; "xx yy" and "yy zz" tie at len 5
    val (top2, _) = ngram("xx yy zz", 2)
    assert(top2 === 5.0 / 8.0)
  }

  test("ngram_repetition edge cases: short and empty docs") {
    assert(ngram("one two", 5) === ((0.0, 0.0))) // fewer than n tokens
    assert(ngram("", 2) === ((0.0, 0.0)))        // zero total chars
    assert(ngram("single", 1) === ((1.0, 0.0)))  // one unigram covers all
  }

  private def lines(text: String): (Double, Double) = {
    val r = Seq(text).toDF("text")
      .select(line_repetition(col("text")).as("s"))
      .select("s.dup_line_frac", "s.dup_line_char_frac").head()
    (r.getDouble(0), r.getDouble(1))
  }

  test("line_repetition counts duplicate trimmed non-empty lines") {
    // lines: x, y, x, x (trimmed), zzz -> x×3 duplicated of 5 lines
    val (lf, cf) = lines("x\ny\nx\n  x  \nzzz\n")
    assert(lf === 3.0 / 5.0)
    assert(cf === 3.0 / 7.0) // 3 dup chars of 1+1+1+1+3 total line chars
  }

  test("line_repetition is 0 without duplicates or without lines") {
    assert(lines("a\nb\nc") === ((0.0, 0.0)))
    assert(lines("") === ((0.0, 0.0)))
    assert(lines("single line, no newline") === ((0.0, 0.0)))
  }

  test("null text yields null structs") {
    val r = Seq("x").toDF("text")
      .select(
        ngram_repetition(lit(null).cast("array<string>"), 2).as("g"),
        line_repetition(lit(null).cast("string")).as("l"))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}

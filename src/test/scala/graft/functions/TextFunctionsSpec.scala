package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c.as("v")).collect()(0).get(0)

  test("normalize lowercases, collapses whitespace, trims") {
    assert(one("  Hello   WORLD\t x ", TextFunctions.normalize($"text")) ===
      "hello world x")
  }

  test("tokens splits normalized text on single spaces") {
    assert(one("A  b\tC", TextFunctions.tokens($"text"))
      .asInstanceOf[scala.collection.Seq[String]].toSeq === Seq("a", "b", "c"))
  }

  test("shingles produces k-grams; short docs yield whole-doc shingle") {
    assert(one("a b c d", TextFunctions.shingles($"text", 3))
      .asInstanceOf[scala.collection.Seq[String]].toSeq === Seq("a b c", "b c d"))
    assert(one("a b", TextFunctions.shingles($"text", 3))
      .asInstanceOf[scala.collection.Seq[String]].toSeq === Seq("a b"))
  }

  test("token counts: whitespace and bpe-ish") {
    assert(one("hello world 42!", TextFunctions.tokenCount($"text")) === 3)
    // bpe-ish: [hello][world][4][2][!]
    assert(one("hello world 42!", TextFunctions.bpeTokenCount($"text")) === 5)
  }

  test("stopword and punct counts") {
    assert(one("the cat is on the mat", TextFunctions.stopwordCount($"text")) === 4)
    assert(one("a, b. c!", TextFunctions.punctCount($"text")) === 3)
  }

  test("quality score is in [0,1] and rewards stopword-bearing prose") {
    val prose = "the quick brown fox is on the mat with a friend of the house"
    val junk = "@@@@ #### $$$$ %%%%"
    val ps = one(prose, TextFunctions.qualityScore($"text")).asInstanceOf[Double]
    val js = one(junk, TextFunctions.qualityScore($"text")).asInstanceOf[Double]
    assert(ps > js)
    assert(ps >= 0.0 && ps <= 1.0)
    assert(js >= 0.0 && js <= 1.0)
  }

  test("langId picks marker languages, falls back to en") {
    assert(one("der hund und die katze", TextFunctions.langId($"text")) === "de")
    assert(one("le chat et la porte", TextFunctions.langId($"text")) === "fr")
    assert(one("el gato y los perros", TextFunctions.langId($"text")) === "es")
    assert(one("plain english words here", TextFunctions.langId($"text")) === "en")
  }

  test("fingerprints are normalization-invariant") {
    val a = one("Hello  World", TextFunctions.fingerprint_md5($"text"))
    val b = one("hello world", TextFunctions.fingerprint_md5($"text"))
    assert(a === b)
    val fa = one("Hello  World", TextFunctions.fingerprint64($"text"))
    val fb = one("hello world", TextFunctions.fingerprint64($"text"))
    assert(fa === fb)
  }

  test("PII detection counts per category; redaction replaces all matches") {
    val t = "mail a@b.com and c.d+x@e.org, ip 192.168.0.1, " +
      "call 555-123-4567, ssn 123-45-6789 done"
    assert(one(t, TextFunctions.piiCount($"text", "email")) === 2)
    assert(one(t, TextFunctions.piiCount($"text", "ipv4")) === 1)
    assert(one(t, TextFunctions.piiCount($"text", "phone")) === 1)
    assert(one(t, TextFunctions.piiCount($"text", "ssn")) === 1)
    val red = one(t, TextFunctions.redactPii($"text"))
    assert(red === "mail [EMAIL] and [EMAIL], ip [IP], " +
      "call [PHONE], ssn [SSN] done")
    // clean text passes through untouched, zero counts
    assert(one("no pii here", TextFunctions.redactPii($"text")) ===
      "no pii here")
    assert(one("no pii here", TextFunctions.piiCount($"text", "email")) === 0)
    // phone and SSN shapes do not shadow each other
    assert(one("555-123-4567", TextFunctions.piiCount($"text", "ssn")) === 0)
    assert(one("123-45-6789", TextFunctions.piiCount($"text", "phone")) === 0)
  }

  test("C4 cleaning: urls and tags scrubbed, non-terminal lines dropped") {
    assert(one("go to https://x.io/a?b=1 and http://y.z now",
      TextFunctions.stripUrls($"text")) === "go to  and  now")
    assert(one("a <b>bold</b> <div class=\"x\">tag</div> end",
      TextFunctions.stripHtml($"text")) === "a bold tag end")
    assert(one("Keeps this line.\nmenu home about\nAnd this one!\nbye",
      TextFunctions.keepTerminalLines($"text")) ===
      "Keeps this line.\nAnd this one!")
    // closing-quote terminal counts; trailing spaces tolerated
    assert(one("He said \"stop.\"  \nnot this",
      TextFunctions.keepTerminalLines($"text")) === "He said \"stop.\"  ")
  }

  test("filter rules: each rule discriminates its own failure mode") {
    val good = ("word " * 15 + "the a of " + "sentence " * 15).trim
    assert(one(good, TextFunctions.ruleWordCount($"text")) === true)
    assert(one(good, TextFunctions.ruleMeanWordLength($"text")) === true)
    assert(one(good, TextFunctions.ruleStopwords($"text")) === true)
    assert(one(good, TextFunctions.ruleSymbolRatio($"text")) === true)
    assert(one("too short", TextFunctions.ruleWordCount($"text")) === false)
    assert(one(("x " * 40).trim,
      TextFunctions.ruleMeanWordLength($"text")) === false) // mean len 1
    assert(one(("word " * 40).trim,
      TextFunctions.ruleStopwords($"text")) === false) // no stopwords
    assert(one(("#!? " * 40).trim,
      TextFunctions.ruleSymbolRatio($"text")) === false)
  }
}

package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class TextFunctionsSpec extends AnyFunSuite with SparkTestSession {

  private def one[T](c: org.apache.spark.sql.Column, text: String = "x"): T = {
    val s = spark; import s.implicits._
    Seq(text).toDF("text").select(c).head.get(0).asInstanceOf[T]
  }

  test("hash60 equals the first 15 md5 hex digits (cross-engine contract)") {
    // md5("abc") = 900150983cd24fb0... -> 0x900150983cd24fb
    assert(one[Long](TextFunctions.hash60(col("text")), "abc") === 648541476951500027L)
  }

  test("wordShingles: bigrams, and empty (not reversed-sequence) under 2 tokens") {
    assert(one[Seq[String]](TextFunctions.wordShingles(TextFunctions.tokens(col("text"))), "a b c")
      === Seq("a b", "b c"))
    assert(one[Seq[String]](TextFunctions.wordShingles(TextFunctions.tokens(col("text"))), "solo")
      === Seq.empty)
  }

  test("hits counts token multiplicity") {
    assert(one[Long](TextFunctions.hits(TextFunctions.tokens(col("text")), Seq("the", "a")),
      "the cat the hat a mat") === 3L)
  }

  test("simhash: equal inputs agree, near inputs are close, far inputs differ") {
    def sh(t: String) = one[Long](TextFunctions.simhash(TextFunctions.tokens(col("text"))), t)
    val a = sh("spark query engine for large scale data processing pipelines")
    val b = sh("spark query engine for large scale data processing pipelines")
    val c = sh("spark query engine for huge scale data processing pipelines")
    val d = sh("entirely unrelated words about cooking pasta tonight")
    assert(a === b)
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(a, c) < ham(a, d))
  }

  test("predictLang picks the dominant stopword profile, ties to profile order") {
    def pl(t: String) = one[String](TextFunctions.predictLang(TextFunctions.tokens(col("text"))), t)
    assert(pl("the cat and a dog of the house") === "en")
    assert(pl("der hund und die katze ist da") === "de")
    assert(pl("le chat et les chiens des villes") === "fr")
    assert(pl("no stopwords here whatsoever") === "en") // all-zero tie -> first profile
  }

  test("charGramHashes emits length-n+1 rolling hashes") {
    assert(one[Seq[Long]](TextFunctions.charGramHashes(col("text"), 8), "abcdefghij").size === 3)
  }

  test("lshParams lands the S-curve inflection on the target") {
    // the shipped banding is what the advisor picks for its own band
    assert(TextFunctions.lshParams(0.29) === ((TextFunctions.MinHashBands,
      TextFunctions.MinHashRows)))
    // high thresholds want more rows per band (steeper curve)
    val (_, rHi) = TextFunctions.lshParams(0.85, 24)
    val (_, rLo) = TextFunctions.lshParams(0.10, 24)
    assert(rHi > rLo)
    // every factorization multiplies back to the budget
    for (t <- Seq(0.1, 0.3, 0.5, 0.7, 0.9); k <- Seq(24, 36, 128)) {
      val (b, r) = TextFunctions.lshParams(t, k)
      assert(b * r === k)
      // collision prob is monotone in s and crosses ~0.5 near the
      // advertised inflection
      val inf = math.pow(1.0 / b, 1.0 / r)
      val p = TextFunctions.lshCollisionProb(inf, b, r)
      assert(p > 0.3 && p < 0.8, s"t=$t k=$k p=$p")
    }
  }
}

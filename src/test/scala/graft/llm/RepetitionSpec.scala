package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The Gopher repetition suite's arithmetic, pinned on fixtures the
  * synthetic corpus can't exercise (it has no intra-doc duplicate
  * 5-grams, so the driver oracle only proves the zero path there):
  *
  *   - coverage is a position-set UNION: an all-same-token doc reads
  *     exactly 1.0, where summing occurrence spans would read 15/7;
  *   - non-overlapping duplicates cover exactly their tokens;
  *   - the top-gram fraction weighs the gram's token chars times its
  *     count against total token chars;
  *   - the published thresholds gate the flags and the conjunction.
  */
class RepetitionSpec extends AnyFunSuite with SparkTestSession {

  private def run(docs: (Long, String)*) = {
    val s = spark; import s.implicits._
    Repetition.gopherRepetition(docs.toSeq.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("duplicate coverage is a union, not a sum of occurrence spans") {
    // "a a a a a a a": the 5-gram "a a a a a" occurs at pos 0,1,2 —
    // the union covers all 7 tokens exactly once (7/7); a naive sum
    // of spans would claim 15 of 7 chars
    val r = run(1L -> "a a a a a a a")(1L)
    assert(r.getAs[Long]("dup5_e6") === 1000000L)
    // 6- and 7-grams also duplicate-free coverage: 6-gram occurs
    // twice (pos 0,1) covering all 7; 7-gram occurs once -> 0
    assert(r.getAs[Long]("dup6_e6") === 1000000L)
    assert(r.getAs[Long]("dup7_e6") === 0L)
    assert(r.getAs[Long]("r_dup5") === 0L) // 1.0 > 0.15 threshold
    assert(r.getAs[Long]("pass") === 0L)
  }

  test("non-overlapping duplicate 5-grams cover exactly their tokens") {
    // "a b c d e a b c d e x": "a b c d e" twice (pos 0, 5), union
    // covers idx 0..9 = 10 single-char tokens of 11 total chars
    val r = run(1L -> "a b c d e a b c d e x")(1L)
    assert(r.getAs[Long]("dup5_e6") === (10L * 1000000L) / 11L)
    // no duplicate 6-grams ("b c d e a" bridge differs from suffix)
    assert(r.getAs[Long]("dup6_e6") === 0L)
  }

  test("top-gram fraction = count x gram token chars / total chars") {
    // "xy xy xy zz": top 2-gram "xy xy" occurs 2x (overlapping pos
    // 0,1), gram chars 4, total chars 8 -> 2*4/8 = 1.0
    val r = run(1L -> "xy xy xy zz")(1L)
    assert(r.getAs[Long]("top2_e6") === 1000000L)
    assert(r.getAs[Long]("r_top2") === 0L)
    // a clean doc LONG ENOUGH that a single occurrence stays under
    // every threshold (the published rules assume real documents —
    // at 60 distinct 3-char tokens the top 4-gram is 12/180 = 6.7%):
    // every gram unique -> dup coverages 0, all flags pass
    val c = run(2L -> (0 until 60).map(i => f"t$i%02d").mkString(" "))(2L)
    assert(c.getAs[Long]("dup5_e6") === 0L)
    assert(c.getAs[Long]("top4_e6") === (12L * 1000000L) / 180L)
    assert(c.getAs[Long]("pass") === 1L)
  }

  test("docs shorter than n contribute zeros, never errors") {
    val r = run(1L -> "one two three")(1L) // no 5..10-grams at all
    (5 to 10).foreach(n => assert(r.getAs[Long](s"dup$n" + "_e6") === 0L))
    assert(r.getAs[Long]("top2_e6") > 0L)
  }

  test("a separator-only doc has zero token chars and zero fractions") {
    // six spaces split to 7 EMPTY tokens (split keeps empties by
    // design): grams exist in BOTH branches — the top 2-gram is a
    // lone separator, and the empty 5-gram duplicates (cnt = 3) into
    // the coverage join — while wc = 0, so an unguarded  x DIV wc
    // divides by zero (ADVICE r10). The guarded fractions read the
    // honest 0: the grams hold no token characters at all.
    val r = run(1L -> "      ", 2L -> "real words here")(1L)
    assert(r.getAs[Long]("top2_e6") === 0L)
    (5 to 10).foreach(n => assert(r.getAs[Long](s"dup$n" + "_e6") === 0L))
  }
}

package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class BpeSpec extends AnyFunSuite with SparkTestSession {

  /** Plain-Scala BPE reference: same greedy left-to-right merge, same
    * (cnt desc, a asc, b asc) tiebreak, same stop rule.
    */
  private def refLearn(words: Map[String, Long], rounds: Int): Seq[(String, String)] = {
    var ws: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    for (_ <- 1 to rounds if !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- ws; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((a, b), _) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        merges += ((a, b))
        ws = ws.map { case (syms, f) =>
          val out = syms.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == a && x == b)
              acc.init :+ (a + b)
            else acc :+ x
          }
          (out, f)
        }
      }
    }
    merges.result()
  }

  private def learnSpark(words: Map[String, Long], rounds: Int) = {
    val s = spark; import s.implicits._
    Bpe.learn(words.toSeq.toDF("w", "freq"), rounds)
  }

  test("classic Sennrich corpus learns the expected first merges") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = learnSpark(words, 4)
    assert(merges === refLearn(words, 4))
    // first merge is (e,s): freq 6+3=9, the unique maximum
    assert(merges.head === (("e", "s")))
    // second fuses the new symbol: (es,t) with the same 9
    assert(merges(1) === (("es", "t")))
  }

  test("spark trainer matches the reference on seeded random corpora") {
    val rnd = new scala.util.Random(11)
    val alpha = "abcde"
    def word() = (1 to (2 + rnd.nextInt(6)))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val words = Seq.fill(60)(word())
      .groupBy(identity).map { case (w, xs) => (w, xs.size.toLong) }
    for (rounds <- Seq(1, 3, 6))
      assert(learnSpark(words, rounds) === refLearn(words, rounds),
        s"rounds=$rounds")
  }

  test("encodeWords folds the learned merges like the reference") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(23)
    val alpha = "abcd"
    def word() = (1 to (2 + rnd.nextInt(5)))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val words = Seq.fill(50)(word())
      .groupBy(identity).map { case (w, xs) => (w, xs.size.toLong) }
    val merges = learnSpark(words, 5)
    assert(merges === refLearn(words, 5))

    // reference encode: the same greedy fold applied merge-by-merge
    def refEncode(w: String): Vector[String] =
      merges.foldLeft(w.map(_.toString).toVector) { case (syms, (a, b)) =>
        syms.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
          else acc :+ x
        }
      }

    val got = Bpe.encodeWords(words.toSeq.toDF("w", "freq"), merges)
      .select($"w", $"syms").as[(String, Seq[String])].collect().toMap
    for ((w, _) <- words)
      assert(got(w) === refEncode(w), s"word=$w")
  }

  test("greedy fold does not re-fuse a just-merged symbol") {
    val s = spark; import s.implicits._
    // merge (a,a) over "aaaa" -> [aa, aa], not [aaa, a] or [aaaa]
    val out = Seq(("aaaa", 1L)).toDF("w", "freq")
      .select(Bpe.initialSymbols(col("w")).as("syms"), col("freq"))
      .select(Bpe.applyMerge("syms", "a", "a").as("syms"))
      .head().getSeq[String](0)
    assert(out === Seq("aa", "aa"))
    // and stops cleanly when nothing can merge
    assert(refLearn(Map("x" -> 3L), 5) === Nil)
    assert(learnSpark(Map("x" -> 3L), 5) === Nil)
  }
}

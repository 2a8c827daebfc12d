package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class MisraGriesSpec extends AnyFunSuite with SparkTestSession {

  /** Every item with frequency > n/(k+1) must hold a counter — the
    * superset guarantee the exact-recount stage relies on.
    */
  private def supersetHolds(items: Seq[String], k: Int): Boolean = {
    val agg = new MisraGriesAggregator(k)
    val cands = agg.finish(items.foldLeft(agg.zero)(agg.reduce)).toSet
    val n = items.size
    val truth = items.groupBy(identity).collect {
      case (w, xs) if xs.size.toLong * (k + 1) > n => w
    }.toSet
    truth.subsetOf(cands)
  }

  test("superset guarantee holds under adversarial orderings") {
    // heavy item interleaved, front-loaded, back-loaded, and drowned
    // in distinct noise designed to force decrements
    val noise = (1 to 300).map(i => s"n$i")
    val heavy = Seq.fill(60)("H")
    val orders = Seq(
      (heavy ++ noise),                                 // front-loaded
      (noise ++ heavy),                                 // back-loaded
      noise.zipAll(heavy, "", "").flatMap {             // interleaved
        case (a, b) => Seq(a, b).filter(_.nonEmpty)
      }
    )
    for (items <- orders; k <- Seq(3, 5, 10))
      assert(supersetHolds(items, k), s"k=$k failed on ${items.take(5)}...")
  }

  test("superset guarantee survives arbitrary merge splits") {
    val rnd = new scala.util.Random(42)
    val items = rnd.shuffle(
      Seq.fill(80)("A") ++ Seq.fill(50)("B") ++
        (1 to 200).map(i => s"z${rnd.nextInt(150)}"))
    val k = 6
    val agg = new MisraGriesAggregator(k)
    val n = items.size
    val truth = items.groupBy(identity).collect {
      case (w, xs) if xs.size.toLong * (k + 1) > n => w
    }.toSet
    assert(truth.nonEmpty) // the test must actually test something
    for (splits <- Seq(2, 3, 7)) {
      val parts = items.grouped(math.max(1, items.size / splits)).toSeq
      val merged = parts
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge)
      assert(truth.subsetOf(agg.finish(merged).toSet), s"splits=$splits")
      assert(merged.size <= k) // bounded state after every merge
    }
  }

  test("udaf candidates + exact recount are partitioning-invariant") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val words = Seq.fill(500)("hot") ++ Seq.fill(200)("warm") ++
      (1 to 600).map(_ => s"cold${rnd.nextInt(400)}")
    val k = 4
    val mg = udaf(new MisraGriesAggregator(k))
    def heavyHitters(parts: Int): Set[(String, Long)] = {
      val toks = rnd.shuffle(words).toDF("w").repartition(parts)
        .localCheckpoint(true)
      val cand = toks.agg(count(lit(1)).as("n"), mg(col("w")).as("c"))
        .select(col("n"), explode(col("c")).as("w"))
      toks.join(broadcast(cand), "w")
        .groupBy("w", "n").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * (k + 1) > col("n"))
        .select("w", "cnt")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    }
    val expected = {
      val n = words.size
      words.groupBy(identity).collect {
        case (w, xs) if xs.size.toLong * (k + 1) > n => (w, xs.size.toLong)
      }.toSet
    }
    assert(expected === Set(("hot", 500L)))
    for (parts <- Seq(1, 3, 16))
      assert(heavyHitters(parts) === expected, s"parts=$parts")
  }
}

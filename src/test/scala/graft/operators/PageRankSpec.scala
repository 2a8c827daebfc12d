package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class PageRankSpec extends AnyFunSuite with SparkTestSession {

  private def edges(rows: (Long, Long)*) = {
    val s = spark; import s.implicits._
    rows.toDF("src", "dst")
  }

  private def ranksOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a cycle is a fixpoint: uniform rank survives every round") {
    // 3-cycle: r0 = 1e9/3 = 333333333; each round returns
    // 150000000/3 + 85*333333333/100 = 50000000 + 283333333 = r0
    val cyc = edges((1L, 2L), (2L, 3L), (3L, 1L))
    for (iters <- Seq(0, 1, 4)) {
      val got = ranksOf(PageRank.pageRankE9(cyc, "src", "dst", iters))
      assert(got === Map(1L -> 333333333L, 2L -> 333333333L, 3L -> 333333333L),
        s"iters=$iters")
    }
  }

  test("symmetric star after one round: exact integer values, mass conserved") {
    // hub 1 <-> leaves 2,3,4. r0 = 250000000; hub outdeg 3, leaf 1.
    // r1(hub)  = 150000000/4 + 85*(3*250000000)/100    = 675000000
    // r1(leaf) = 37500000   + 85*(250000000/3)/100     = 108333333
    val star = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (3L, 1L), (4L, 1L))
    val got = ranksOf(PageRank.pageRankE9(star, "src", "dst", iters = 1))
    assert(got === Map(1L -> 675000000L, 2L -> 108333333L,
                       3L -> 108333333L, 4L -> 108333333L))
    assert(got.values.sum === 999999999L) // 1e9 minus one flooring unit
  }

  test("mass bounds on seeded-random dangling-free graphs: total rank in " +
       "(1e9 - flooring loss, 1e9], every rank >= the teleport base") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 10 + rnd.nextInt(20)
      // symmetrize so no node dangles (mass leaks only to flooring)
      val und = (0 until 3 * n).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2).distinct
      val g = edges((und ++ und.map(_.swap)).distinct: _*)
      val iters = 3
      val got = ranksOf(PageRank.pageRankE9(g, "src", "dst", iters))
      val v = got.size.toLong
      val base = 150000000L / v
      val total = got.values.sum
      // per round, each node floors <= 1 unit per in-edge contribution
      // plus 2 for the base/damp divisions; loss compounds over rounds
      val lossBound = (iters + 1).toLong * (2L * v + 2L * g.count())
      assert(total <= 1000000000L, s"trial $trial: mass created ($total)")
      assert(total > 1000000000L - lossBound,
        s"trial $trial: lost more than flooring allows ($total)")
      assert(got.values.forall(_ >= base), s"trial $trial: rank below teleport base")
    }
  }

  test("a node with no in-edges keeps only the teleport base") {
    // 1 -> 2: node 1 receives nothing; N=2, base = 150000000/2
    val got = ranksOf(PageRank.pageRankE9(edges((1L, 2L)), "src", "dst", 1))
    assert(got(1L) === 75000000L)
    // 2 gets base + 85% of 1's full rank (outdeg 1, dangling leak ok)
    assert(got(2L) === 75000000L + 85L * 500000000L / 100L)
  }
}

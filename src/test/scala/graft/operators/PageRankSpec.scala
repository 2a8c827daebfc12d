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

  test("a node with no in-edges keeps only the teleport base") {
    // 1 -> 2: node 1 receives nothing; N=2, base = 150000000/2
    val got = ranksOf(PageRank.pageRankE9(edges((1L, 2L)), "src", "dst", 1))
    assert(got(1L) === 75000000L)
    // 2 gets base + 85% of 1's full rank (outdeg 1, dangling leak ok)
    assert(got(2L) === 75000000L + 85L * 500000000L / 100L)
  }
}

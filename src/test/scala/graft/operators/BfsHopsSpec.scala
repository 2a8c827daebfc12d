package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class BfsHopsSpec extends AnyFunSuite with SparkTestSession {

  private def edges(rows: (Long, Long)*) = {
    val s = spark; import s.implicits._
    rows.toDF("src", "dst")
  }
  private def seeds(ids: Long*) = {
    val s = spark; import s.implicits._
    ids.toDF("id")
  }
  private def hopsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // 1 -> 2 -> 3 -> 4, plus a shortcut 1 -> 3 and an island 9 -> 10
  private val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (9L, 10L))

  test("hops are the MINIMUM over paths; unreachable nodes are absent") {
    val got = hopsOf(BfsHops.hopsFrom(g, "src", "dst", seeds(1L), "id", maxHops = 5))
    // 3 is reachable in 2 via 1->2->3 but in 1 via the shortcut
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("maxHops truncates the frontier") {
    val got = hopsOf(BfsHops.hopsFrom(g, "src", "dst", seeds(1L), "id", maxHops = 1))
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("multi-source: each node takes its closest seed; seed dupes collapse") {
    val got = hopsOf(BfsHops.hopsFrom(g, "src", "dst",
      seeds(1L, 9L, 9L), "id", maxHops = 2))
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L,
                       9L -> 0L, 10L -> 1L))
  }

  test("maxHops = 0 returns just the seed set") {
    val got = hopsOf(BfsHops.hopsFrom(g, "src", "dst", seeds(4L), "id", maxHops = 0))
    assert(got === Map(4L -> 0L))
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class AsOfJoinSpec extends AnyFunSuite with SparkTestSession {

  private def left(rows: (Long, Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("k", "lt", "lpay")
  }
  private def right(rows: (Long, Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("k", "rt", "rpay")
  }

  test("backward match picks greatest rt <= lt per key") {
    val l = left((1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, "c"))
    val r = right((1L, 8L, "r8"), (1L, 20L, "r20"), (2L, 9L, "r9"))
    val got = AsOfJoin.backward(l, r, Seq("k"), "lt", "rt")
      .orderBy("k", "lt").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2),
        Option(x.get(3)).map(_.asInstanceOf[Long]), Option(x.getString(4))))
    assert(got.toSeq === Seq(
      (1L, 10L, "a", Some(8L), Some("r8")),
      (1L, 25L, "b", Some(20L), Some("r20")),
      (2L, 5L, "c", None, None))) // right row at t=9 is in the future
  }

  test("exact-time tie matches (>= semantics): right row at same t wins") {
    val got = AsOfJoin.backward(
      left((1L, 10L, "a")), right((1L, 10L, "tie"), (1L, 4L, "old")),
      Seq("k"), "lt", "rt").head
    assert(got.getString(4) === "tie")
  }

  test("NULL payload in the matched right row stays NULL (no inheritance " +
    "from an older right row)") {
    val s = spark; import s.implicits._
    val l = left((1L, 15L, "a"))
    val r = Seq((1L, 5L, Some("x")), (1L, 10L, Option.empty[String]))
      .toDF("k", "rt", "rpay")
    val got = AsOfJoin.backward(l, r, Seq("k"), "lt", "rt").head
    assert(got.getLong(3) === 10L)      // matched the t=10 row
    assert(got.isNullAt(4))             // its null payload is preserved
  }

  test("forward match picks smallest rt >= lt per key, incl. exact tie") {
    val l = left((1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, "c"), (2L, 20L, "d"))
    val r = right((1L, 10L, "tie"), (1L, 20L, "r20"), (2L, 9L, "r9"))
    val got = AsOfJoin.forward(l, r, Seq("k"), "lt", "rt")
      .orderBy("k", "lt").collect()
      .map(x => (x.getLong(0), x.getLong(1),
        Option(x.get(3)).map(_.asInstanceOf[Long]), Option(x.getString(4))))
    assert(got.toSeq === Seq(
      (1L, 10L, Some(10L), Some("tie")), // exact-time right row matches
      (1L, 25L, None, None),             // nothing at or after 25
      (2L, 5L, Some(9L), Some("r9")),
      (2L, 20L, None, None)))
  }

  test("nearest picks the closer side, ties backward, tolerance nulls far matches") {
    val l = left((1L, 10L, "a"), (1L, 14L, "b"), (1L, 100L, "far"))
    val r = right((1L, 8L, "r8"), (1L, 20L, "r20"))
    val got = AsOfJoin.nearest(l, r, Seq("k"), "lt", "rt")
      .orderBy("lt").collect()
      .map(x => (x.getLong(1), Option(x.get(3)).map(_.asInstanceOf[Long])))
    // lt=10: prev d=2 < next d=10 -> r8; lt=14: prev d=6 == next d=6 -> tie backward r8
    assert(got.toSeq === Seq((10L, Some(8L)), (14L, Some(8L)), (100L, Some(20L))))

    val tol = AsOfJoin.nearest(l, r, Seq("k"), "lt", "rt", tolerance = Some(10L))
      .orderBy("lt").collect()
      .map(x => (x.getLong(1), Option(x.get(3)).map(_.asInstanceOf[Long])))
    // lt=100 is 80 past r20 -> nulled by the tolerance window
    assert(tol.toSeq === Seq((10L, Some(8L)), (14L, Some(8L)), (100L, None)))
  }

  test("tolerance on backward keeps the left join shape with nulls") {
    val l = left((1L, 50L, "a"))
    val r = right((1L, 10L, "r10"))
    val got = AsOfJoin.backward(l, r, Seq("k"), "lt", "rt", tolerance = Some(5L)).head
    assert(got.isNullAt(3) && got.isNullAt(4))
  }

  test("nearest runs both carries on ONE exchange and ONE sort") {
    val l = left((1L, 10L, "a"), (2L, 5L, "c"))
    val r = right((1L, 8L, "r8"), (2L, 9L, "r9"))
    val q = AsOfJoin.nearest(l, r, Seq("k"), "lt", "rt")
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1,
      s"nearest must shuffle once; plan:\n$plan")
    // the forward window's ordering (_t) is a prefix of the backward
    // one's (_t, _side): stacked windows must not re-sort
    assert("\\bSort \\[".r.findAllIn(plan).length === 1,
      s"nearest must sort once; plan:\n$plan")
  }

  test("column-name collisions are rejected early") {
    val s = spark; import s.implicits._
    val l = left((1L, 1L, "a"))
    val rClash = Seq((1L, 1L, "x")).toDF("k", "rt", "lpay") // lpay on both sides
    assertThrows[IllegalArgumentException](
      AsOfJoin.backward(l, rClash, Seq("k"), "lt", "rt"))
    val rReserved = Seq((1L, 1L, "x")).toDF("k", "rt", "_side")
    assertThrows[IllegalArgumentException](
      AsOfJoin.backward(l, rReserved, Seq("k"), "lt", "rt"))
  }
}

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

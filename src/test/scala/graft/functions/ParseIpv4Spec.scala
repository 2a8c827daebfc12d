package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkTestSession
import graft.app.Watchlist

class ParseIpv4Spec extends AnyFunSuite with SparkTestSession {

  private def h(s: String): Long = ParseIpv4Helper.parse(UTF8String.fromString(s))

  test("helper parses valid addresses and rejects malformed ones") {
    assert(h("0.0.0.0") === 0L)
    assert(h("255.255.255.255") === 4294967295L)
    assert(h("10.100.67.139") === 174343051L)
    assert(h("1.2.3.4") === 16909060L)
    for (bad <- Seq("", "1.2.3", "1.2.3.4.5", "1.2.3.256", "a.b.c.d",
        "1..2.3", "1.2.3.4x", ".1.2.3", "1.2.3."))
      assert(h(bad) === -1L, s"'$bad' should be rejected")
  }

  test("registered SQL function: codegen path + NULL on malformed") {
    val rows = spark.sql(
      "SELECT parse_ipv4('192.168.1.1'), parse_ipv4('not an ip')").head
    assert(rows.getLong(0) === 3232235777L)
    assert(rows.isNullAt(1))
  }

  test("expression survives a columnar scan (whole-stage codegen path)") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    val got = Seq("10.0.0.1", "bogus", "10.0.0.3").toDF("line")
      .select(expr("parse_ipv4(line)").as("ip"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq === Seq(Some(167772161L), None, Some(167772163L)))
  }

  test("Watchlist.fromDataFrame: comments and malformed rows dropped") {
    val s = spark; import s.implicits._
    val df = Seq("10.0.0.1", "# comment", "", "nope", " 10.0.0.2 ").toDF("entry")
    assert(Watchlist.fromDataFrame(df, "entry") === Set(167772161L, 167772162L))
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** SaltedJoin ≡ plain join, frame-to-frame (q35's oracle proves it
  * only through an aggregate): same schema, same multiset of rows,
  * duplicate-row multiplicity preserved.
  */
class SaltedJoinSpec extends AnyFunSuite with SparkTestSession {

  private val D = "/root/testdata/sf0.001"

  test("salted inner join returns exactly the plain join's row multiset") {
    val l = spark.read.parquet(s"$D/lineitem.parquet")
      .select(col("l_orderkey").as("k"), col("l_linenumber"), col("l_quantity"))
    val r = spark.read.parquet(s"$D/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_custkey"))
    val plain = l.join(r, Seq("k"))
    val salted = SaltedJoin.inner(l, r, Seq("k"), salts = 5)
    assert(salted.columns.toSeq === plain.columns.toSeq,
      "the salt must not leak into the output schema")
    assert(salted.exceptAll(plain).isEmpty, "salted produced extra rows")
    assert(plain.exceptAll(salted).isEmpty, "salted lost rows")
  }

  test("salted LEFT join equals the plain left join, nulls included") {
    val s = spark; import s.implicits._
    // orders 1..2000 vs a dim covering only even keys: odd keys must
    // survive exactly once each with a null right side
    val l = spark.read.parquet(s"$D/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_custkey"))
    val r = spark.read.parquet(s"$D/orders.parquet")
      .filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
    val plain = l.join(r, Seq("k"), "left")
    val salted = SaltedJoin.left(l, r, Seq("k"), salts = 5)
    assert(salted.columns.toSeq === plain.columns.toSeq)
    assert(salted.exceptAll(plain).isEmpty, "salted-left produced extra rows")
    assert(plain.exceptAll(salted).isEmpty, "salted-left lost rows")
    assert(salted.filter(col("price").isNull).count() ===
      l.filter(col("k") % 2 =!= 0).count(),
      "every unmatched left row must survive exactly once with nulls")
  }

  test("identical duplicate rows of a hot key keep their multiplicity") {
    val s = spark; import s.implicits._
    // 1000 byte-identical left rows on one key (they all salt alike —
    // the worst spread) must still each match the one right row
    val hot = Seq.fill(1000)((7L, "x")).toDF("k", "payload")
    val dim = Seq((7L, "seven"), (8L, "eight")).toDF("k", "name")
    val out = SaltedJoin.inner(hot, dim, Seq("k"), salts = 4)
    assert(out.count() === 1000)
    assert(out.select("name").distinct().collect().map(_.getString(0)).toSeq === Seq("seven"))
  }
}

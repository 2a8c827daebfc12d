package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.llm.{TextFunctions => TF}

class ShingleGenSpec extends AnyFunSuite with SparkTestSession {

  test("shingle_gen matches posexplode(wordShingles) exactly, edge cases included") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "solo"),          // below w: no rows
      (3L, ""),              // empty: no rows
      (4L, "x  y"),          // doubled space -> empty middle token, like split
      (5L, "p q")
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("sg_docs")

    val viaGen = spark.sql(
      """SELECT doc_id, t.pos, t.shingle
        |FROM sg_docs LATERAL VIEW shingle_gen(text, 2) t AS pos, shingle""".stripMargin)
      .orderBy("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

    val viaComposed = docs
      .select(col("doc_id"),
        posexplode(TF.wordShingles(TF.tokens(col("text")), 2)).as(Seq("pos", "shingle")))
      .orderBy("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getString(2)))

    assert(viaGen.toSeq === viaComposed.toSeq)
    assert(viaGen.count(_._1 == 1L) === 3) // "a b","b c","c d"
    assert(viaGen.count(_._1 == 2L) === 0)
    assert(viaGen.count(_._1 == 3L) === 0)
    assert(viaGen.filter(_._1 == 4L).map(_._3).toSeq === Seq("x ", " y")) // split-like empties
  }

  test("parity with the composed form over 200 seeded adversarial strings (w=2 and w=3)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(42)
    val alphabets = Seq("ab ", "αβ ", "日本語 ", "a  b\tc ", " x ")
    val docs = (1L to 200L).map { i =>
      val alpha = alphabets(rnd.nextInt(alphabets.length))
      val len = rnd.nextInt(30)
      (i, (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    }.toDF("doc_id", "text")
    docs.createOrReplaceTempView("sg_prop_docs")

    for (w <- Seq(2, 3)) {
      val viaGen = spark.sql(
        s"""SELECT doc_id, t.pos, t.shingle
           |FROM sg_prop_docs LATERAL VIEW shingle_gen(text, $w) t AS pos, shingle""".stripMargin)
        .orderBy("doc_id", "pos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val viaComposed = docs
        .select(col("doc_id"),
          posexplode(TF.wordShingles(TF.tokens(col("text")), w)).as(Seq("pos", "shingle")))
        .orderBy("doc_id", "pos").collect()
        .map(r => (r.getLong(0), r.getInt(1).toLong, r.getString(2)))
      assert(viaGen.toSeq === viaComposed.toSeq, s"divergence at w=$w")
    }
  }

  test("shingle_gen_range(2,4) = union of shingle_gen per width, pos intact") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (1L to 100L).map { i =>
      val len = rnd.nextInt(12)
      (i, (0 until len).map(_ => "abc x "(rnd.nextInt(6))).mkString)
    }.toDF("doc_id", "text")
    docs.createOrReplaceTempView("sgr_docs")

    val viaRange = spark.sql(
      """SELECT doc_id, t.n, t.pos, t.shingle
        |FROM sgr_docs LATERAL VIEW shingle_gen_range(text, 2, 4) t AS n, pos, shingle""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .toSeq.sorted

    val viaPerWidth = (2 to 4).flatMap { w =>
      spark.sql(
        s"""SELECT doc_id, $w AS n, t.pos, t.shingle
           |FROM sgr_docs LATERAL VIEW shingle_gen(text, $w) t AS pos, shingle""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    }.sorted

    assert(viaRange.nonEmpty)
    assert(viaRange === viaPerWidth)
  }

  test("width must be a literal; strings only") {
    val s = spark; import s.implicits._
    Seq((1L, "a b")).toDF("doc_id", "text").createOrReplaceTempView("sg_docs2")
    val e = intercept[Exception] {
      spark.sql("SELECT t.* FROM sg_docs2 LATERAL VIEW shingle_gen(text, doc_id) t").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal") ||
      e.getMessage.toLowerCase.contains("shingle"))
  }
}

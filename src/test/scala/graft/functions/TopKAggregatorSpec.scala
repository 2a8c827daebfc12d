package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.SparkTestSession
import graft.llm.Similarity

class TopKAggregatorSpec extends AnyFunSuite with SparkTestSession {

  test("reduce/merge keep the k best by (score desc, id asc) with bounded state") {
    val agg = new TopKAggregator(2)
    val buf = Seq(Scored(5, 1), Scored(9, 2), Scored(7, 3), Scored(9, 1))
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf === Seq(Scored(9, 1), Scored(9, 2))) // ties break by id
    assert(buf.size <= 2)
    val merged = agg.merge(buf, Seq(Scored(10, 7), Scored(1, 8)))
    assert(agg.finish(merged) === Seq(Scored(10, 7), Scored(9, 1)))
  }

  test("bruteTopKAgg matches the window-based bruteTopK") {
    val s = spark; import s.implicits._
    def pad(xs: Float*): Seq[Float] = xs.padTo(8, 0f)
    val corpus = Seq(
      (1L, pad(1f, 0f)), (2L, pad(0.9f, 0.1f)), (3L, pad(0f, 1f)),
      (4L, pad(-1f, 0f)), (5L, pad(0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") <= 2)
    val viaWindow = Similarity.bruteTopK(corpus, probes, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val viaAgg = Similarity.bruteTopKAgg(corpus, probes, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaAgg === viaWindow)
    assert(viaAgg.size === 6)
  }
}

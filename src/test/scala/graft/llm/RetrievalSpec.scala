package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** RRF fusion semantics: rank positions (not scores) are what fuses,
  * a doc missing from one list still surfaces on the other's
  * contribution alone, and ties break to the lower doc_id.
  */
class RetrievalSpec extends AnyFunSuite with SparkTestSession {

  test("rrfFuse sums reciprocal-rank contributions; missing side = 0") {
    val s = spark; import s.implicits._
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("q_id", "doc_id", "rnk")
    val b = Seq((1L, 11L, 1L), (1L, 12L, 2L)).toDF("q_id", "doc_id", "rnk")
    val got = Retrieval.rrfFuse(a, b, k = 3).orderBy("rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 1e6/61 = 16393, 1e6/62 = 16129 (integer division)
    assert(got.toSeq === Seq(
      (1L, 11L, 16393L + 16129L, 1L), // on both lists -> wins
      (1L, 10L, 16393L, 2L),          // sparse-only
      (1L, 12L, 16129L, 3L)))         // dense-only
  }

  test("rrfFuse ties break to the lower doc_id") {
    val s = spark; import s.implicits._
    val a = Seq((1L, 20L, 1L), (1L, 7L, 2L)).toDF("q_id", "doc_id", "rnk")
    val b = Seq((1L, 7L, 1L), (1L, 20L, 2L)).toDF("q_id", "doc_id", "rnk")
    // both docs: 1e6/61 + 1e6/62 — identical fused score
    val got = Retrieval.rrfFuse(a, b, k = 2).orderBy("rnk")
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(got.toSeq === Seq((7L, 1L), (20L, 2L)))
  }
}

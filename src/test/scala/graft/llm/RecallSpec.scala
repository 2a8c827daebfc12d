package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Recall of the approximate ANN paths against the exact brute-force
  * oracle on the real testdata embeddings: the multi-table / multi-
  * probe variants exist precisely to recover recall lost to a single
  * hash table / cluster, and their candidate sets are supersets of the
  * single-table ones by construction — so recall must be monotonically
  * ≥, which is what these tests pin down.
  */
class RecallSpec extends AnyFunSuite with SparkTestSession {

  private val D = "/root/testdata/sf0.001"
  private val K = 3

  private def emb = spark.read.parquet(s"$D/embeddings.parquet")
  private def probes = emb.filter(col("vec_id") % 100 === 0)

  /** (probe_id, neighbor_id) pairs of a top-k result. */
  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recall(approx: Set[(Long, Long)], exact: Set[(Long, Long)]): Double =
    if (exact.isEmpty) 1.0 else approx.intersect(exact).size.toDouble / exact.size

  test("multi-table LSH recall >= single-table recall vs exact top-k") {
    val exact = pairs(Similarity.bruteTopK(emb, probes, K))
    val single = recall(pairs(Similarity.bucketedTopK(emb, probes, K)), exact)
    val multi = recall(pairs(Similarity.multiTableTopK(emb, probes, K, tables = 3)), exact)
    assert(multi >= single, s"multi-table recall $multi < single-table $single")
  }

  test("multi-probe IVF recall >= single-probe recall vs exact top-k") {
    val cents = emb.filter(col("vec_id") < 8)
    val exact = pairs(Similarity.bruteTopK(emb, probes, K))
    val p1 = recall(pairs(Similarity.ivfTopK(emb, probes, cents, K, nprobe = 1)), exact)
    val p2 = recall(pairs(Similarity.ivfTopK(emb, probes, cents, K, nprobe = 2)), exact)
    assert(p2 >= p1, s"nprobe=2 recall $p2 < nprobe=1 recall $p1")
  }

  test("Lloyd-refined centroids keep IVF recall >= sampled centroids") {
    val sampled = emb.filter(col("vec_id") < 8)
    val exact = pairs(Similarity.bruteTopK(emb, probes, K))
    val rSampled = recall(pairs(Similarity.ivfTopK(emb, probes, sampled, K)), exact)
    // two Lloyd rounds (x27's setting): refinement tightens clusters
    // around the data, so the probe's own cluster captures more of its
    // true neighbors — on this (deterministic) corpus the recall must
    // not drop
    val refined = Similarity.centroidFrameFromE6(
      Similarity.lloydIterateE6(emb, sampled, maxRounds = 2))
    val rRefined = recall(pairs(Similarity.ivfTopK(emb, probes, refined, K)), exact)
    assert(rRefined >= rSampled,
      s"refined-centroid recall $rRefined < sampled-centroid recall $rSampled")
  }

  test("multi-table candidate pairs are a superset of table-0 pairs") {
    // the mechanism behind the recall guarantee: table 0 of the
    // multi-table code IS the single-table bucket, so every
    // single-table candidate survives into the union
    val single = pairs(Similarity.bucketedTopK(emb, probes, K * 10))
    val multi = pairs(Similarity.multiTableTopK(emb, probes, K * 10, tables = 3))
    // with k large enough to not truncate (buckets hold few vectors
    // at sf0.001), the multi-table result must contain every
    // single-table neighbor
    assert(single.subsetOf(multi),
      s"missing from multi-table: ${single.diff(multi).take(5)}")
  }
}

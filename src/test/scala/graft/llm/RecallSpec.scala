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

  test("tiny-corpus floor: sf0.01 PQ recall is noise at any dial; exact-scoring IVF recovers") {
    // VERDICT r9 ask #7. At sf0.1-derived scales the x41 registry
    // setting (nprobe=2, 8-codeword books) saturates score-recall@3 =
    // 1.000 (SCALE_r09) — but on a TINY index (sf0.01: 500 vectors, 6
    // probes) PQ's quantization distortion exceeds the corpus's own
    // score gaps, so the SAME setting reads 0.17 and no PQ dial
    // rescues it (nprobe 2→8 × codebooks 8→128 measured 0.06–0.28,
    // non-monotone). The documented remedy is dropping PQ: ivfTopK
    // (same pruning, exact scoring) climbs to 1.000 at exhaustive
    // nprobe. See Similarity.ivfPqTopK's "choosing nprobe and
    // codebook size by corpus scale" scaladoc — this test pins the
    // floor and the remedy so the guidance stays true.
    val d01 = "/root/testdata/sf0.01"
    val base = spark.read.parquet(s"$d01/embeddings.parquet")
    val p = base.filter(col("vec_id") % 97 === 0)
    val sample = base.filter(col("vec_id") < 8)
    val exact = Similarity.bruteTopKAgg(base, p, K)
    val kth = exact.groupBy("probe_id")
      .agg(min("cos_e6").as("kth_e6"), count(lit(1)).as("nk"))
      .localCheckpoint(true)
    val denom = kth.agg(sum("nk")).head().getLong(0)
    val vecs = base.select(col("vec_id").as("neighbor_id"), col("embedding").as("n_vec"))
    val pv = p.select(col("vec_id").as("probe_id"), col("embedding").as("p_vec"))
    def scoreRecall(res: DataFrame): Double =
      res.join(vecs, "neighbor_id").join(broadcast(pv), "probe_id")
        .select(col("probe_id"), Similarity.cosineE6(col("p_vec"), col("n_vec")).as("cos_e6"))
        .join(broadcast(kth), "probe_id")
        .filter(col("cos_e6") >= col("kth_e6")).count().toDouble / denom

    val cb8 = Similarity.pqCodebooks(sample, m = 8, subDim = 8)
    val registry = scoreRecall(
      Similarity.ivfPqTopK(base, p, sample, cb8, k = K, nprobe = 2, subDim = 8))
    val remedy = scoreRecall(Similarity.ivfTopK(base, p, sample, K, nprobe = 8))
    info(f"sf0.01 recall@$K: PQ registry setting $registry%.3f, " +
      f"exact-scoring IVF nprobe=8 $remedy%.3f over $denom slots")
    assert(registry < 0.40,
      f"PQ recall $registry%.3f no longer floors on the tiny corpus — " +
        "update the ivfPqTopK corpus-scale guidance with the new numbers")
    assert(remedy >= 0.90,
      f"exact-scoring exhaustive-nprobe recall $remedy%.3f — the documented remedy broke")
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

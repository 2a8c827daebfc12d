package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class SimilaritySpec extends AnyFunSuite with SparkTestSession {

  // 8-dim vectors so the 8-plane sign bucket is fully defined
  private def vecs(rows: (Long, Seq[Float])*) = {
    val s = spark; import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def pad(xs: Float*): Seq[Float] = xs.padTo(8, 0f)

  test("cosineE6: exact values on exact-sqrt vectors") {
    val s = spark; import s.implicits._
    val df = Seq((Seq(2f, 0f), Seq(2f, 0f), Seq(0f, 1f), Seq(-3f, 0f)))
      .toDF("a", "b", "c", "d")
    val r = df.select(
      Similarity.cosineE6(col("a"), col("b")),
      Similarity.cosineE6(col("a"), col("c")),
      Similarity.cosineE6(col("a"), col("d"))).head
    assert(r.getLong(0) === 1000000L) // identical: 4/(2*2) = 1
    assert(r.getLong(1) === 0L)       // orthogonal
    assert(r.getLong(2) === -1000000L) // opposite: -6/(2*3) = -1
  }

  test("bruteTopK ranks by cosine desc with id tie-break") {
    val corpus = vecs(
      (1L, pad(1f, 0f)), (2L, pad(0.9f, 0.1f)), (3L, pad(0f, 1f)),
      (4L, pad(-1f, 0f)))
    val probes = vecs((1L, pad(1f, 0f)))
    val got = Similarity.bruteTopK(corpus, probes, k = 3)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getLong(3)))
    assert(got.map(_._1).toSeq === Seq(2L, 3L, 4L)) // by similarity
    assert(got.map(_._2).toSeq === Seq(1L, 2L, 3L))
  }

  test("bucketedNearDupPairs finds in-bucket near-dups, a < b, threshold applied") {
    val corpus = vecs(
      (1L, pad(1f, 1f)), (2L, pad(1f, 1f)),      // identical pair, same bucket
      (3L, pad(1f, -1f)),                        // different bucket
      (4L, pad(-1f, -1f, 0.001f)))               // another bucket
    val got = Similarity.bucketedNearDupPairs(corpus, minCosE6 = 900000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // identical vectors floor to 999999: sqrt(2)*sqrt(2) > 2 in IEEE,
    // so the ratio is 1 - 1ulp (the oracle computes the same value)
    assert(got.toSeq === Seq((1L, 2L, 999999L)))
  }

  test("bucketedTopK only scores same-sign-bucket candidates") {
    val corpus = vecs(
      (1L, pad(1f, 1f)),    // bucket: all bits set (zeros count as >= 0)
      (2L, pad(2f, 3f)),    // same bucket as 1
      (3L, pad(-1f, 1f)))   // different bucket (bit 0 clear)
    val probes = vecs((1L, pad(1f, 1f)))
    val got = Similarity.bucketedTopK(corpus, probes, k = 5)
      .collect().map(_.getLong(1))
    assert(got.toSeq === Seq(2L)) // 3 is invisible: different bucket
  }

  test("refineCentroidsE6: one Lloyd round yields exact integer means " +
    "of each cluster's members") {
    // centroids along the axes; members split cleanly by cosine
    val cents = vecs((0L, pad(1f, 0f)), (1L, pad(0f, 1f)))
    val corpus = vecs(
      (10L, pad(2f, 0f)), (11L, pad(4f, 1f)),  // cluster 0
      (12L, pad(0f, 3f)))                      // cluster 1
    val got = Similarity.refineCentroidsE6(corpus, cents)
      .orderBy("cluster", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // cluster 0 dims: mean(2e6,4e6)=3e6; mean(0,1e6)=5e5; n=2
    assert(got.filter(_._1 == 0L).take(2).toSeq ===
      Seq((0L, 1L, 3000000L, 2L), (0L, 2L, 500000L, 2L)))
    // cluster 1 dims: 0 and 3e6; n=1
    assert(got.filter(_._1 == 1L).take(2).toSeq ===
      Seq((1L, 1L, 0L, 1L), (1L, 2L, 3000000L, 1L)))
    // every dim row carries the full member count; 8 dims per cluster
    assert(got.count(_._1 == 0L) === 8 && got.count(_._1 == 1L) === 8)
  }

  test("pqEncode: codebook sample vectors encode to their own codes (dist 0); " +
    "ADC ranks an exact codeword match first") {
    // 4-dim vectors, 2 subspaces of 2 dims, codebook from ids 0/1
    def v4(rows: (Long, Seq[Float])*) = {
      val s = spark; import s.implicits._
      rows.toDF("vec_id", "embedding")
    }
    val sample = v4((0L, Seq(1f, 0f, 5f, 5f)), (1L, Seq(0f, 2f, -1f, 3f)))
    val cbs = Similarity.pqCodebooks(sample, m = 2, subDim = 2)
    assert(cbs === Seq(
      Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 2f))),
      Seq((0L, Seq(5f, 5f)), (1L, Seq(-1f, 3f)))))

    // a corpus mixing the sample itself and a cross-combined vector:
    // sub 0 nearest code 1 (exact), sub 1 nearest code 0 (exact)
    val corpus = sample.union(v4((7L, Seq(0f, 2f, 5f, 5f))))
    val codes = Similarity.pqEncode(corpus, cbs, subDim = 2)
      .orderBy("vec_id", "subspace").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(codes.toSeq === Seq(
      (0L, 0L, 0L), (0L, 1L, 0L),
      (1L, 0L, 1L), (1L, 1L, 1L),
      (7L, 0L, 1L), (7L, 1L, 0L)))

    // ADC from probe 7: vector 7 itself is excluded; of 0 and 1,
    // whichever shares more codeword mass ranks first — exact check:
    // dist(7,0) = d(sub0: [0,2]vs cw0 [1,0]) + 0 = (1+4)e9 = 5e9
    // dist(7,1) = 0 + d(sub1: [5,5] vs cw1 [-1,3]) = (36+4)e9 = 40e9
    val adc = Similarity.pqTopK(corpus, corpus.filter(col("vec_id") === 7L),
        cbs, k = 2, subDim = 2)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(adc.toSeq === Seq((0L, 5000000000L, 1L), (1L, 40000000000L, 2L)))
  }

  test("semanticDedupDrops: within-cluster near-dups collapse to the min id; " +
       "cross-cluster twins survive (the SemDeDup trade)") {
    // centroids 0 (+x) and 1 (+y); 10/11/12 land in cluster 0, 20/21
    // in cluster 1. 10~11~12 are one semantic group (pairwise cos ≈ 1)
    // -> 11 and 12 drop to 10. 20 is IDENTICAL to 21 but also to 10's
    // direction? no — keep cluster 1's pair distinct: 20~21 -> 21
    // drops to 20.
    val corpus = vecs(
      (0L, pad(1f, 0f)), (1L, pad(0f, 1f)),          // the centroids themselves
      (10L, pad(10f, 1f)), (11L, pad(10f, 1.01f)), (12L, pad(9.9f, 1f)),
      (20L, pad(1f, 10f)), (21L, pad(1.01f, 10f)),
      (30L, pad(1f, -20f)))                          // isolated: no pair
    val cents = corpus.filter(col("vec_id") < 2)
    val drops = Similarity.semanticDedupDrops(corpus, cents, minCosE6 = 999000L)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(drops.toSeq === Seq((11L, 10L), (12L, 10L), (21L, 20L)))

    val kept = Similarity.dropSemanticDuplicates(corpus, cents, minCosE6 = 999000L)
      .select("vec_id").orderBy("vec_id").collect().map(_.getLong(0))
    assert(kept.toSeq === Seq(0L, 1L, 10L, 20L, 30L))
  }

  test("mmrTopK demotes a relevance-runner-up that duplicates the leader") {
    // probe p = (1,1,0)-ish; B is most relevant, A nearly duplicates
    // B, C is as relevant as A but orthogonal to B. Pure relevance
    // order is B, A, C — MMR must pick C at rank 2.
    val corpus = vecs(
      (0L, pad(1f, 1f)),        // the probe itself (excluded)
      (1L, pad(1f, 0f)),        // A: cq ~ 707106, near-dup of B
      (2L, pad(1f, 0.05f)),     // B: cq ~ 741583 (leader)
      (3L, pad(0f, 1f)))        // C: cq ~ 707106, orthogonal to A/B
    val got = Similarity.mmrTopK(corpus, probeId = 0L, k = 3, poolSize = 10)
      .orderBy("rnk").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L), (2L, 3L), (3L, 1L)),
      "MMR order must be B, C, A — diversity beats the near-duplicate")
  }

  test("broadcast-join assignment path produces the literal path's exact " +
       "drop list (argmax + tie-break parity), including on random vectors") {
    // planted case
    val planted = vecs(
      (0L, pad(1f, 0f)), (1L, pad(0f, 1f)),
      (10L, pad(10f, 1f)), (11L, pad(10f, 1.01f)), (12L, pad(9.9f, 1f)),
      (20L, pad(1f, 10f)), (21L, pad(1.01f, 10f)), (30L, pad(1f, -20f)))
    // seeded random corpus: near-dups planted by construction (i and
    // i+100 share a direction), plus exact ties for the cid tie-break
    val rnd = new scala.util.Random(42)
    val randomRows = (0L until 60L).map { i =>
      val v = Seq.fill(8)(rnd.nextFloat() * 2f - 1f)
      (i, v)
    }
    val randomCorpus = vecs(randomRows ++ randomRows.take(20).map {
      case (i, v) => (i + 100L, v.map(x => x * 2f)) // same direction, cos=1
    }: _*)
    for ((corpus, thr) <- Seq((planted, 999000L), (randomCorpus, 999999L))) {
      val cents = corpus.filter(col("vec_id") < 2)
      val lit0 = Similarity.semanticDedupDrops(corpus, cents, thr)
        .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      val join0 = Similarity.semanticDedupDrops(corpus, cents, thr,
          assignByJoin = true)
        .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(lit0.nonEmpty, "test corpus must produce drops")
      assert(join0.toSeq === lit0.toSeq)
    }
  }
}

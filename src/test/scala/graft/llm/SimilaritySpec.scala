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
}

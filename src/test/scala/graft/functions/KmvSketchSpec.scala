package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** [[KmvSketchAggregator]] + [[KmvSketch]]: the theta/KMV sketch must
  * be a pure function of the key SET (partitioning-invariant), exact
  * when exhaustive, within its published error when not, and its set
  * operations must satisfy the theta-sketch algebra.
  */
class KmvSketchSpec extends AnyFunSuite with SparkTestSession {

  private val K = 256

  /** Deterministic "random" key stream: distinct longs whose hash63
    * images are uniform (xxhash64 of distinct inputs).
    */
  private def keys(n: Int, salt: Long): Seq[Long] =
    (0 until n).map(i => salt * 10000000L + i.toLong)

  private def sketchOf(ks: Seq[Long], parts: Int): Array[Long] = {
    val s = spark
    import s.implicits._
    val kmv = udaf(new KmvSketchAggregator(K))
    ks.toDF("key").repartition(parts)
      .select(KmvSketch.hash63(col("key")).as("h"))
      .agg(kmv(col("h")).as("sk"))
      .head().getSeq[Long](0).toArray
  }

  test("sketch is a pure function of the key set: partitioning, order, dups") {
    val base = keys(5000, 1)
    val a = sketchOf(base, 1)
    val b = sketchOf(scala.util.Random.shuffle(base ++ base), 32)
    assert(a.toSeq == b.toSeq)
    assert(a.length == K && a.toSeq == a.toSeq.sorted)
  }

  test("exhaustive sketch (n < k) estimates exactly, including set ops") {
    val s = spark
    import s.implicits._
    val kmv = udaf(new KmvSketchAggregator(K))
    val df = (keys(100, 1).map(("a", _)) ++ keys(150, 1).map(("b", _)))
      .toDF("g", "key")
      .select(col("g"), KmvSketch.hash63(col("key")).as("h"))
      .groupBy("g").agg(kmv(col("h")).as("sk"))
    val r = df.groupBy().pivot("g").agg(first("sk"))
      .select(
        KmvSketch.estimate(col("a"), K).as("ea"),
        KmvSketch.estimate(col("b"), K).as("eb"),
        KmvSketch.intersectEstimate(col("a"), col("b"), K).as("ei"),
        KmvSketch.unionEstimate(col("a"), col("b"), K).as("eu"),
        KmvSketch.exceptEstimate(col("b"), col("a"), K).as("ed"))
      .head()
    // keys(100,1) is a prefix of keys(150,1): |A|=100 |B|=150 |A∩B|=100
    assert(math.round(r.getDouble(0)) == 100L)
    assert(math.round(r.getDouble(1)) == 150L)
    assert(math.round(r.getDouble(2)) == 100L)
    assert(math.round(r.getDouble(3)) == 150L)
    assert(math.round(r.getDouble(4)) == 50L)
  }

  test("estimator holds its published error on a 20k-key set") {
    val n = 20000
    val sk = sketchOf(keys(n, 7), 8)
    val s = spark
    import s.implicits._
    val est = Seq(sk).toDF("sk")
      .select(KmvSketch.estimate(col("sk"), K)).head().getDouble(0)
    val rsd = 1.0 / math.sqrt(K - 2) // ~6.3%
    assert(math.abs(est - n) < 4 * rsd * n,
      s"estimate $est vs exact $n exceeds 4 sigma")
  }

  test("theta set algebra: inter + except partitions the union-side view") {
    val s = spark
    import s.implicits._
    val kmv = udaf(new KmvSketchAggregator(K))
    // A = 8000 keys, B = A's back half + 6000 fresh: |A∩B| = 4000
    val a = keys(8000, 3)
    val b = a.drop(4000) ++ keys(6000, 4)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "key")
      .select(col("g"), KmvSketch.hash63(col("key")).as("h"))
      .groupBy("g").agg(kmv(col("h")).as("sk"))
    val r = df.groupBy().pivot("g").agg(first("sk"))
      .select(
        KmvSketch.intersectEstimate(col("a"), col("b"), K).as("ei"),
        KmvSketch.exceptEstimate(col("a"), col("b"), K).as("eanb"),
        KmvSketch.unionEstimate(col("a"), col("b"), K).as("eu"),
        KmvSketch.estimate(col("a"), K).as("ea"))
      .head()
    val (ei, eanb, eu, ea) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val union = 14000.0
    // set-op error is union-relative: 4 sigma of the union size
    val tol = 4.0 / math.sqrt(K - 2) * union
    assert(math.abs(ei - 4000) < tol, s"inter $ei")
    assert(math.abs(eanb - 4000) < tol, s"a-minus-b $eanb")
    assert(math.abs(eu - union) < tol, s"union $eu")
    // inter + (A\B) is A measured at θ∧ — consistent with est(A)
    assert(math.abs(ei + eanb - ea) < tol, s"algebra: $ei + $eanb vs $ea")
  }

  test("aggregator equals k-smallest-distinct at edge sizes (0, 1, k, k+1, dup-heavy)") {
    val s = spark
    import s.implicits._
    val kmv = udaf(new KmvSketchAggregator(K))
    for (n <- Seq(0, 1, K, K + 1, 1000)) {
      val ks = keys(n, 31) ++ keys(n / 2, 31) // second half = duplicates
      val df = ks.toDF("key").select(KmvSketch.hash63(col("key")).as("h"))
      val expected = df.distinct().orderBy("h").limit(K)
        .collect().map(_.getLong(0)).toSeq
      val got = df.agg(kmv(col("h"))).head().getSeq[Long](0)
      assert(got == expected, s"n=$n")
    }
  }

  test("KmvSketchOps primitives equal the sort-based reference on random streams") {
    // the r9 binary-search insert / two-pointer merge must be
    // bit-identical to the former contains + sorted.take(k) forms
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 50) {
      val k = 2 + rnd.nextInt(16)
      val xs = Seq.fill(200)(rnd.nextInt(40).toLong)
      val ref = xs.distinct.sorted.take(k)
      val folded = xs.foldLeft(Vector.empty[Long]: Seq[Long]) { (b, h) =>
        if (b.size >= k && h >= b.last) b else KmvSketchOps.insertSorted(b, h, k)
      }
      assert(folded == ref, s"k=$k insert fold")
      val (l, r) = xs.splitAt(xs.size / 3)
      val (sl, sr) = (l.distinct.sorted.take(k), r.distinct.sorted.take(k))
      assert(KmvSketchOps.mergeSorted(sl, sr, k) ==
        (sl ++ sr).distinct.sorted.take(k), s"k=$k merge")
      assert(KmvSketchOps.mergeTrusted(sl, sr, k) ==
        (sl ++ sr).distinct.sorted.take(k), s"k=$k trusted merge")
    }
    // the asymmetric fold paths and the balanced two-pointer path must
    // all be bit-identical: tiny-vs-large (subset and fresh), and
    // near-equal sizes past the 8-element threshold
    for (k <- Seq(16, 64, 256)) {
      val big = (0L until 300L).map(_ * 3).distinct.sorted.take(k)
      val sub = big.take(4) // contained — the zero-allocation fold
      val fresh = Seq(1L, 4L, 7L) // disjoint tiny side
      val near = (0L until 280L).map(_ * 3 + 1).distinct.sorted.take(k)
      for (b <- Seq(sub, fresh, near)) {
        assert(KmvSketchOps.mergeTrusted(big, b, k) ==
          (big ++ b).distinct.sorted.take(k), s"k=$k b=${b.size}")
        assert(KmvSketchOps.mergeTrusted(b, big, k) ==
          (big ++ b).distinct.sorted.take(k), s"k=$k reversed b=${b.size}")
      }
    }
  }

  test("mergeSorted caps an oversized external sketch at this k") {
    // a sketch persisted under a LARGER k must degrade to its k
    // smallest hashes (still a valid KMV sketch at this k), not flow
    // oversized through the fold paths and break the ≤ k invariant
    // (ADVICE r9)
    val k = 8
    val oversized = (0L until 32L).map(_ * 5) // written under k=32
    val own = Seq(2L, 7L, 101L)
    for ((a, b) <- Seq((oversized, own), (own, oversized),
                       (oversized, Seq.empty[Long]), (oversized, oversized.map(_ + 1)))) {
      val m = KmvSketchOps.mergeSorted(a, b, k)
      assert(m.size <= k, s"size ${m.size} > k=$k")
      assert(m == (a ++ b).distinct.sorted.take(k))
    }
  }

  test("KmvMergeAggregator over stored partials equals the one-shot sketch") {
    val s = spark
    import s.implicits._
    val kmv = udaf(new KmvSketchAggregator(K))
    val kmvMerge = udaf(new KmvMergeAggregator(K))
    val ks = keys(5000, 21)
    val parts = ks.zipWithIndex.map { case (x, i) => (i % 7, x) }
      .toDF("p", "key")
      .select(col("p"), KmvSketch.hash63(col("key")).as("h"))
      .groupBy("p").agg(kmv(col("h")).as("sk"))
    val merged = parts.agg(kmvMerge(col("sk"))).head().getSeq[Long](0)
    assert(merged.toSeq == sketchOf(ks, 4).toSeq)
  }

  test("disjoint sets: intersection estimate stays near zero, union adds") {
    val s = spark
    import s.implicits._
    val kmv = udaf(new KmvSketchAggregator(K))
    val df = (keys(6000, 50).map(("a", _)) ++ keys(6000, 51).map(("b", _)))
      .toDF("g", "key")
      .select(col("g"), KmvSketch.hash63(col("key")).as("h"))
      .groupBy("g").agg(kmv(col("h")).as("sk"))
    val r = df.groupBy().pivot("g").agg(first("sk"))
      .select(
        KmvSketch.intersectEstimate(col("a"), col("b"), K).as("ei"),
        KmvSketch.unionEstimate(col("a"), col("b"), K).as("eu"))
      .head()
    val tol = 4.0 / math.sqrt(K - 2) * 12000
    assert(r.getDouble(0) < tol, s"disjoint inter ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 12000) < tol, s"union ${r.getDouble(1)}")
  }

  test("unionSketch equals aggregating the concatenated inputs") {
    val s = spark
    import s.implicits._
    val kmv = udaf(new KmvSketchAggregator(K))
    val (x, y) = (keys(3000, 60), keys(3000, 61) ++ keys(1000, 60))
    val parts = (x.map(("x", _)) ++ y.map(("y", _))).toDF("g", "key")
      .select(col("g"), KmvSketch.hash63(col("key")).as("h"))
      .groupBy("g").agg(kmv(col("h")).as("sk"))
    val viaUnion = parts.groupBy().pivot("g").agg(first("sk"))
      .select(KmvSketch.unionSketch(col("x"), col("y"), K).as("u"))
      .head().getSeq[Long](0)
    assert(viaUnion.toSeq == sketchOf(x ++ y, 8).toSeq)
  }

  test("merge is associative and equals the one-shot sketch") {
    val agg = new KmvSketchAggregator(K)
    def sk(ks: Seq[Long]): Seq[Long] =
      ks.foldLeft(agg.zero)((b, x) => agg.reduce(b, x & Long.MaxValue))
    val (x, y, z) = (keys(400, 11), keys(400, 12), keys(400, 13))
    val m1 = agg.merge(agg.merge(sk(x), sk(y)), sk(z))
    val m2 = agg.merge(sk(x), agg.merge(sk(y), sk(z)))
    assert(m1 == m2)
    assert(m1 == sk(x ++ y ++ z))
  }
}

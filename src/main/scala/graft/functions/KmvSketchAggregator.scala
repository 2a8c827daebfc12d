package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV ("k minimum values" / theta) distinct-count sketch as a typed
  * aggregate — the mergeable summary family member that HLL (q18/q55/
  * st19) canNOT replace: because the sketch IS a uniform sample of the
  * hashed key space (the k smallest 63-bit hashes), two sketches
  * support set INTERSECTION and DIFFERENCE estimates, not just union.
  * HLL registers only max-merge, so "users who did A and B" or "parts
  * shipped in 1995 but not 1996" need either a full re-scan per
  * combination or this sketch. Published technique: Bar-Yossef et al.
  * "Counting distinct elements in a data stream" (RANDOM 2002) and the
  * theta-sketch framework of Dasgupta et al. (PODS 2016).
  *
  * Input must already be folded to a uniform NON-NEGATIVE 63-bit hash
  * — [[KmvSketch.hash63]] — so the buffer is a plain sorted Seq[Long]
  * and every set operation downstream is a codegen'd array builtin
  * (array_intersect / array_except / array_union on longs).
  *
  * Determinism (what lets estimate COLUMNS survive the driver's hash
  * gate as within-bound flags): "k smallest distinct values of a set"
  * is invariant to input order and partition splits, so the sketch —
  * and every estimate derived from it — is a pure function of the key
  * SET, exactly like HLL register state.
  *
  * Why not approx_count_distinct: at 100 TB the exact side of any
  * overlap matrix is a |keys|-scale shuffle per GROUP PAIR; with KMV
  * the per-group state is k longs (2 KB at k=256), the overlap matrix
  * is computed on sketch rows alone, and map-side combine keeps every
  * exchange at O(k) per group — the same economics as the HLL rollup
  * (q55) with the set-algebra HLL lacks.
  */
final class KmvSketchAggregator(k: Int)
    extends Aggregator[Long, Seq[Long], Array[Long]] {
  require(k > 1, s"k must be > 1, got $k")

  def zero: Seq[Long] = Vector.empty

  /** O(1) reject once the buffer is full (h >= current max — the hot
    * path after warm-up: only ~k·ln(n)/n of rows pass); an accepted
    * insert binary-searches the sorted buffer for both membership and
    * position (O(log k) compare + one O(k) patch, no re-sort — ADVICE
    * r8), keeping it sorted-distinct and capped at k.
    */
  def reduce(buf: Seq[Long], h: Long): Seq[Long] =
    if (buf.size >= k && h >= buf.last) buf
    else KmvSketchOps.insertSorted(buf, h, k)

  // both sides are this aggregator's own buffers — sorted-distinct by
  // construction, so the trusted merge skips the defensive sort check
  def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    KmvSketchOps.mergeTrusted(a, b, k)

  /** Sorted ascending; size < k means the sketch is EXHAUSTIVE (it
    * holds every distinct hash seen) and estimates become exact.
    */
  def finish(buf: Seq[Long]): Array[Long] = buf.toArray

  def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Merges PERSISTED KMV sketches (the q55 lifecycle for the theta
  * family): input rows are sketch ARRAYS read back from parquet, the
  * merge is "k smallest of the union" — associative, commutative,
  * and identical to what [[KmvSketchAggregator]] would have built
  * over the concatenated raw inputs, so rollups over stored partials
  * never rescan the base table. Unlike HLL partials (hll_union_agg),
  * the merged result still supports intersection/difference.
  */
final class KmvMergeAggregator(k: Int)
    extends Aggregator[Seq[Long], Seq[Long], Array[Long]] {
  require(k > 1, s"k must be > 1, got $k")

  def zero: Seq[Long] = Vector.empty
  // sk arrives from EXTERNAL rows (persisted sketches) — the full
  // mergeSorted defends against an unsorted input once per row
  def reduce(buf: Seq[Long], sk: Seq[Long]): Seq[Long] =
    KmvSketchOps.mergeSorted(buf, sk, k)
  // internal buffers — invariant holds, trusted merge
  def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    KmvSketchOps.mergeTrusted(a, b, k)
  def finish(buf: Seq[Long]): Array[Long] = buf.toArray

  def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Shared sorted-buffer primitives for the KMV aggregators. Both keep
  * the invariant "sorted ascending, distinct, size ≤ k", so inserts
  * and merges never need a sort — the O(k log k) re-sort per accepted
  * row that ADVICE r8 flagged in reduce(). Outputs are bit-identical
  * to the former contains+sorted.take(k) forms (KmvSketchSpec pins
  * the sketches).
  */
private[functions] object KmvSketchOps {

  /** Insert `h` into sorted-distinct `buf`, capped at k smallest.
    * Binary search finds the position; an existing hit is a no-op.
    */
  def insertSorted(buf: Seq[Long], h: Long, k: Int): Seq[Long] = {
    var lo = 0
    var hi = buf.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < buf.size && buf(lo) == h) buf
    else {
      val ins = buf.patch(lo, h :: Nil, 0)
      if (ins.size > k) ins.dropRight(1) else ins
    }
  }

  /** k smallest distinct of two sorted-distinct sequences. Falls back
    * to sorting an input that violates the precondition, and CAPS each
    * side at k (defensive — persisted sketches are written sorted and
    * ≤ k by construction, but a sketch persisted under a LARGER k must
    * degrade to its k smallest hashes — still a valid KMV sketch at
    * this k — rather than flow oversized through [[mergeTrusted]]'s
    * fold paths and break the size ≤ k buffer invariant; ADVICE r9).
    * Use [[mergeTrusted]] when both sides are this module's own
    * buffers.
    */
  def mergeSorted(a0: Seq[Long], b0: Seq[Long], k: Int): Seq[Long] = {
    def sortedOf(s: Seq[Long]): Seq[Long] = {
      var i = 1
      while (i < s.size && s(i - 1) < s(i)) i += 1
      val sorted = if (i >= s.size) s else s.distinct.sorted
      if (sorted.size > k) sorted.take(k) else sorted
    }
    mergeTrusted(sortedOf(a0), sortedOf(b0), k)
  }

  /** [[mergeSorted]] minus the precondition check. Asymmetric sizes
    * (the dominant shape in a mixed distinct+UDAF plan, where the
    * final aggregation merges thousands of row-sized partials into a
    * k-sized buffer) fold the small side in by binary-search insert —
    * zero allocation when the small side is already contained; the
    * balanced case runs a primitive-array two-pointer walk. Outputs
    * are bit-identical across all paths (KmvSketchSpec pins it).
    */
  def mergeTrusted(a: Seq[Long], b: Seq[Long], k: Int): Seq[Long] =
    if (a.isEmpty) b.take(k)
    else if (b.isEmpty) a.take(k)
    else if (b.size < 8 || b.size.toLong * 8 <= a.size)
      b.foldLeft(a)((acc, h) =>
        if (acc.size >= k && h >= acc.last) acc else insertSorted(acc, h, k))
    else if (a.size < 8 || a.size.toLong * 8 <= b.size)
      a.foldLeft(b)((acc, h) =>
        if (acc.size >= k && h >= acc.last) acc else insertSorted(acc, h, k))
    else {
      val aa = a.toArray
      val bb = b.toArray
      val out = new Array[Long](math.min(k, aa.length + bb.length))
      var i = 0
      var j = 0
      var n = 0
      while (n < out.length && (i < aa.length || j < bb.length)) {
        val next =
          if (j >= bb.length || (i < aa.length && aa(i) <= bb(j))) {
            val v = aa(i); i += 1; v
          } else { val v = bb(j); j += 1; v }
        // skip the duplicate when both sides carry the same hash
        if (i < aa.length && aa(i) == next) i += 1
        if (j < bb.length && bb(j) == next) j += 1
        out(n) = next
        n += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(
        if (n == out.length) out else java.util.Arrays.copyOf(out, n))
    }
}

/** Column-level estimators over KMV sketch arrays. All pure builtin
  * array expressions — estimates compute ON THE SKETCH ROWS, never
  * re-touching the base table (the q55 lifecycle: persist per-grain
  * sketches once, answer set-algebra forever after from KB of state).
  */
object KmvSketch {

  /** 2^63 as double — hashes are uniform on [0, 2^63). */
  private val HashSpace = 9.223372036854776e18

  /** Uniform 63-bit non-negative hash of any column: xxhash64 (a
    * codegen'd builtin) folded to [0, 2^63) by dropping the sign bit.
    */
  def hash63(c: Column): Column = shiftrightunsigned(xxhash64(c), 1)

  /** θ as a raw long threshold: the kth smallest hash when the sketch
    * is full, else "everything" (an exhaustive sketch has seen the
    * whole set, so every hash is below threshold). Long.MaxValue =
    * 2^63−1 mis-scales estimates by 1 part in 9.2e18 — noise far
    * below the estimator's own 1/sqrt(k−2).
    */
  private def thetaLong(sk: Column, k: Int): Column =
    when(size(sk) < k, lit(Long.MaxValue)).otherwise(element_at(sk, k))

  /** Distinct-count estimate: exact size when exhaustive, else the
    * unbiased KMV estimator (k−1)/θ.
    */
  def estimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
        element_at(sk, k).cast("double"))

  /** |A ∩ B| estimate: survivors below θ∧ = min(θa, θb) present in
    * both sketches, scaled by 1/θ∧ (the theta-sketch intersection).
    * Error is relative to the UNION size, not the intersection — a
    * tiny overlap of two huge sets carries the sets' own noise.
    */
  def intersectEstimate(a: Column, b: Column, k: Int): Column = {
    val th = least(thetaLong(a, k), thetaLong(b, k))
    size(filter(array_intersect(a, b), h => h < th)).cast("double") *
      lit(HashSpace) / th.cast("double")
  }

  /** |A \ B| estimate (same θ∧ scaling and union-relative error). */
  def exceptEstimate(a: Column, b: Column, k: Int): Column = {
    val th = least(thetaLong(a, k), thetaLong(b, k))
    size(filter(array_except(a, b), h => h < th)).cast("double") *
      lit(HashSpace) / th.cast("double")
  }

  /** The union SKETCH — k smallest of the combined hash sets, i.e.
    * exactly what the aggregator itself would have built over the
    * concatenated inputs (lossless merge, like HLL union).
    */
  def unionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** |A ∪ B| estimate via the merged sketch. */
  def unionEstimate(a: Column, b: Column, k: Int): Column =
    estimate(unionSketch(a, b, k), k)

  /** Driver-check predicate (the q18b/q55 pattern): estimate within
    * `pct`% of the exact value computed cross-engine. Folded to a
    * 0/1 long so the flag itself is hash-stable.
    */
  def withinPct(est: Column, exact: Column, pct: Int): Column =
    (abs(est - exact.cast("double")) * lit(100) <=
      exact.cast("double") * lit(pct)).cast("long")
}

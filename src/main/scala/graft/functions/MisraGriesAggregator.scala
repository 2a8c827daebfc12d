package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory heavy-hitter candidates (Misra–Gries) as a typed
  * aggregate (SURVEY.md §7 custom-Catalyst item (a), like
  * [[TopKAggregator]]): a summary of at most k counters whose partial
  * buffers merge associatively, so map-side combine keeps every
  * exchange at O(k) no matter how many tokens flow in.
  *
  * Guarantee (the reason the downstream exact-verification pass can
  * trust this): after absorbing n items, every item with true
  * frequency > n/(k+1) holds a counter — regardless of input order or
  * how partitions split the stream. Decrements only ever remove k+1
  * DISTINCT items together, which can happen at most n/(k+1) times;
  * merge (Agarwal et al., "Mergeable Summaries") sums counters and
  * subtracts the (k+1)-th largest count, preserving the same bound
  * additively. The candidate SET may vary with partitioning (extras
  * are partition-order dependent); the guaranteed superset is what
  * makes the exact-count filter deterministic.
  *
  * Why not a plain groupBy count: over a 100 TB token stream the
  * full-vocabulary aggregate shuffles |vocab| counters per partition;
  * this summary shuffles k per partition, and the follow-up exact
  * count runs only over the <= partitions*k surviving candidates.
  */
final class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k > 0, s"k must be positive, got $k")

  def zero: Map[String, Long] = Map.empty

  def reduce(buf: Map[String, Long], w: String): Map[String, Long] =
    buf.get(w) match {
      case Some(c) => buf.updated(w, c + 1L)
      case None if buf.size < k => buf.updated(w, 1L)
      case None =>
        // decrement all k counters and the implicit counter of w:
        // k+1 distinct items give up one count each
        buf.iterator.map { case (x, c) => (x, c - 1L) }
          .filter(_._2 > 0L).toMap
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (w, c)) =>
      m.updated(w, m.getOrElse(w, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // keep the k largest; subtracting the (k+1)-th largest count
      // from every survivor preserves the frequency-error bound
      val cut = summed.valuesIterator.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.iterator.map { case (w, c) => (w, c - cut) }
        .filter(_._2 > 0L).toMap
    }
  }

  /** Candidates only — counts are MG estimates, not answers; callers
    * re-count exactly (sorted for a deterministic array layout).
    */
  def finish(buf: Map[String, Long]): Seq[String] = buf.keys.toSeq.sorted

  def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A scored item flowing into the bounded top-k aggregate. */
final case class Scored(score: Long, id: Long)

/** Bounded top-k typed aggregate (SURVEY.md §7 custom-Catalyst item
  * (a)): keeps the k largest items by (score desc, id asc) in an
  * O(k) buffer with map-side partial aggregation.
  *
  * Why an `Aggregator` and not a window: `row_number().over(partition)`
  * must shuffle and SORT every candidate row per group; this buffer
  * caps per-group state at k before the shuffle, so the exchange
  * carries |groups|·k rows instead of |candidates| — the difference
  * between shuffling top-5s and shuffling every scored pair at
  * 100 TB. Public typed-agg API, no Catalyst internals.
  */
final class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0, s"k must be positive, got $k")

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def trim(xs: Seq[Scored]): Seq[Scored] =
    xs.sortWith(better).take(k)

  def zero: Seq[Scored] = Seq.empty
  def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] =
    if (buf.size < k) trim(buf :+ x)
    else if (better(x, buf.last)) trim(buf :+ x)
    else buf
  def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = trim(a ++ b)
  def finish(buf: Seq[Scored]): Seq[Scored] = buf

  def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}

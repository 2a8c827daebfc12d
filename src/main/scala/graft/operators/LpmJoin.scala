package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Longest-prefix-match (CIDR) join — the network-analytics lookup the
  * reference's watch-list semantics generalize to: classify each IPv4
  * address by the most specific prefix that contains it in a routing /
  * watch table.
  *
  * Spark-first shape: a theta-join ("net contains ip") would be a
  * nested loop; instead each address explodes into one candidate per
  * DISTINCT mask length present in the table (≤ 33 by construction, so
  * the blow-up is a small constant), the candidates equi-join the
  * broadcast prefix table on (net, len), and an order-by-struct max
  * keeps the longest match per address. No shuffle touches the big
  * side: generator + broadcast join + partial-aggregated max.
  */
object LpmJoin {

  /** The network address of `ip` under a `len`-bit mask (ip as an
    * unsigned IPv4 in a long): clear the low 32-len bits. Pure
    * codegen'd shifts.
    */
  def netOf(ip: Column, len: Int): Column =
    if (len >= 32) ip else shiftleft(shiftright(ip, 32 - len), 32 - len)

  /** LPM over the DISTINCT values of `ipCol`: returns one row per
    * matched address — (ipCol, len, net, payload...) of its longest
    * containing prefix; unmatched addresses are absent (the caller
    * left-joins back if "no match" rows are wanted).
    *
    * `prefixes` must be unique on (netCol, lenCol) and small enough to
    * broadcast — true of routing and watch tables by definition. The
    * distinct-lens collect is bounded by the 33 possible IPv4 mask
    * lengths, so it is metadata, not data, at the driver.
    */
  def lpm(ips: DataFrame, prefixes: DataFrame, ipCol: String,
          netCol: String = "net", lenCol: String = "len"): DataFrame = {
    val lens = prefixes.select(lenCol).distinct()
      .collect().map(_.get(0).asInstanceOf[Number].intValue()).sorted.toIndexedSeq
    require(lens.nonEmpty && lens.forall(l => l >= 0 && l <= 32),
      s"mask lengths out of range: ${lens.mkString(",")}")
    val payload = prefixes.columns.filterNot(c => c == netCol || c == lenCol)

    val cands = ips.select(col(ipCol)).distinct()
      .select(col(ipCol), explode(array(lens.map(l =>
        struct(lit(l).as(lenCol), netOf(col(ipCol), l).as(netCol))): _*)).as("c"))
      .select(col(ipCol), col(s"c.$lenCol").as(lenCol), col(s"c.$netCol").as(netCol))

    // longest = max over a struct ordered by len first; (net, len)
    // uniqueness makes the max unambiguous
    val m = struct(col(lenCol) +: col(netCol) +: payload.toIndexedSeq.map(col): _*)
    cands.join(broadcast(prefixes), Seq(netCol, lenCol))
      .groupBy(ipCol)
      .agg(max(m).as("m"))
      .select(col(ipCol) +: (lenCol +: netCol +: payload.toSeq).map(c => col(s"m.$c").as(c)): _*)
  }
}

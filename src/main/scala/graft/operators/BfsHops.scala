package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distance, the third iterative graph operator
  * next to connected components and [[PageRank]]: per round the
  * frontier is one equi-join of the current distance frame with the
  * edge list plus one min-aggregation — distances only ever shrink,
  * so `min` makes every round idempotent and order-free (no float, no
  * tie ambiguity: the DISTANCE lattice is what makes an iterative
  * traversal oracle-checkable, the same argument as PageRank's
  * integer divisions).
  *
  * Scale: rounds = `maxHops` (a constant), never rows; each round
  * shuffles the (node, hop) frame — |V| rows — against the edge list
  * on the node id; a persisted edge list bucketed by `src` makes the
  * per-round join exchange-free on the big side. Lineage is flattened
  * per round with an eager localCheckpoint so the plan stays
  * constant-size across rounds.
  */
object BfsHops {

  /** (node, hops) for every node reachable from `seeds` in at most
    * `maxHops` edge traversals; `hops` is the true BFS distance
    * (minimum over all paths). Unreachable nodes are absent.
    */
  def hopsFrom(edges: DataFrame, srcCol: String, dstCol: String,
               seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true) // consumed every round
    var dist = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("hops", lit(0L))
      .localCheckpoint(false) // lazy: the gate count materializes it
    // the distance frame is one row per reached node — broadcast it
    // into the frontier join when its MEASURED size provably fits
    // (the connectedComponents gate): the O(|E|) edge list then never
    // shuffles and each round pays exactly one exchange (the min
    // aggregation). The count doubles as the checkpoint-materializing
    // action (lazy + count = one pass), and past the gate the join
    // degrades to the shuffle form a planet-sized frontier needs.
    // Join strategy never changes the min-lattice values.
    var nDist = dist.count()
    for (_ <- 1 to maxHops) {
      val distSide = if (nDist <= 2000000L) broadcast(dist) else dist
      val frontier = distSide
        .join(e, col("node") === col("src"))
        .select(col("dst").as("node"), (col("hops") + 1L).as("hops"))
      dist = dist.union(frontier)
        .groupBy("node").agg(min("hops").as("hops"))
        .localCheckpoint(false) // lazy: the count below materializes it
      nDist = dist.count()
    }
    dist
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank in e9-scaled INTEGER arithmetic, the same
  * driver-loop-over-rounds shape as connected components (rounds
  * scale with the iteration budget, never with rows): each round is
  * one equi-join of the edge list with the current ranks plus one
  * hash aggregation on the destination — the classic Pregel
  * message-passing round expressed as two shuffles on the node id.
  *
  * All divisions are integer (`DIV`): rank/outdegree contributions,
  * the (1-d)/N teleport base, and the d·Σ damping are each floored in
  * a fixed order, so the result is bit-identical across engines,
  * partitionings, and run orders — which is what makes an ITERATIVE
  * float-free fixpoint oracle-checkable at all (the same trick as
  * Lloyd refinement's e6 means). The cost: each round loses < 1e-9·N
  * of probability mass to flooring (plus dangling-node leak, the
  * standard simplification) — irrelevant for ranking, essential for
  * determinism.
  *
  * Scale: the edge list is the big frame and is iterated over
  * UNCHANGED — a real deployment persists it partitioned by `src` so
  * every round's join co-locates without an exchange (the bucketed
  * pattern BucketingSpec proves); ranks (one row per node) are the
  * small frame. Lineage is flattened per round with an eager
  * localCheckpoint exactly like [[graft.llm.Dedup.connectedComponents]],
  * so the plan never grows with the iteration count.
  */
object PageRank {

  /** Ranks after `iters` rounds over the directed `edges`. Returns
    * (node, rank_e9): rank scaled by 1e9 and floored. `dampE2` is the
    * damping factor in percent (85 = the canonical 0.85).
    *
    * r_0       = 1e9 DIV N
    * contrib_u = r_t(u) DIV outdeg(u)
    * r_{t+1}(v)= (1e9 - dampE2·1e7) DIV N
    *           + (dampE2 · Σ_{u→v} contrib_u) DIV 100
    */
  def pageRankE9(edges: DataFrame, srcCol: String, dstCol: String,
                 iters: Int, dampE2: Long = 85L): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true) // consumed every round + for nodes/outdeg
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count() // scalar: the teleport base needs |V|
    val base = (1000000000L - dampE2 * 10000000L) / n
    // checkpointed: consumed every round — without it each round's
    // plan re-runs the degree aggregation over the edge list
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    // rank-side frames are one row per node — broadcast them when the
    // MEASURED |V| provably fits (the connectedComponents nNodes
    // gate): each round then pays exactly ONE exchange (the contrib
    // aggregation) instead of shuffling the O(|E|) edge list by src
    // and the node table twice more. Past the gate every join
    // degrades to the shuffle form a 100 TB graph needs anyway; a
    // deployment at that scale persists edges bucketed by src (the
    // scaladoc note) and skips the exchange that way. Join strategy
    // never changes values — the e9 integer arithmetic is unchanged.
    def nodeSized(df: DataFrame): DataFrame =
      if (n <= 2000000L) broadcast(df) else df

    var ranks = nodes.withColumn("rank_e9", lit(1000000000L / n))
    for (_ <- 1 to iters) {
      // `div`, not `/`: Column./ on longs goes through DOUBLE, whose
      // nearest-rounding can flip the floor on large numerators —
      // integer division must stay integer to match the oracle bit-
      // for-bit
      val contribs = e
        .join(nodeSized(ranks.withColumnRenamed("node", "src")), "src")
        .join(nodeSized(outdeg), "src")
        .select(col("dst").as("node"),
          expr("rank_e9 div outdeg").as("contrib"))
        .groupBy("node").agg(sum("contrib").as("s"))
      ranks = nodes
        .join(nodeSized(contribs), Seq("node"), "left_outer")
        .select(col("node"),
          (lit(base) + expr(s"($dampE2 * coalesce(s, 0L)) div 100"))
            .as("rank_e9"))
        .localCheckpoint(true) // flatten lineage: plans must not grow per round
    }
    ranks
  }
}

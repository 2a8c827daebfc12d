package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.{TextFunctions => TF}

/** Retrieval rankers shared by the standalone queries and the hybrid
  * fusion path (x52 / x59). The scale contract for every ranker here:
  * the probe (query) side is a broadcast-sized batch by definition,
  * the corpus side is scanned once, and the ranked output is bounded
  * at |probes|·k rows before anything downstream joins it.
  */
object Retrieval {

  /** BM25 top-k per probe doc (k1=0.9, b=0.3 as exact rationals; see
    * the x52 scaladoc in LlmQueries for the e6-floored integer
    * algebra). Probes are the `probeMod`-sampled docs querying with
    * their own token set; a doc never retrieves itself.
    *
    * Output: (q_id, doc_id, score_e6, rnk) with rnk ≤ k.
    *
    * Scale: one explode+agg pass builds tf (materialized once — the
    * x32 pattern); dlen/dfreq re-aggregate it; the probe token set and
    * the corpus-stats row are broadcast, so the only corpus-sized
    * shuffles are the tf/score aggregations themselves.
    */
  def bm25TopK(docs: DataFrame, k: Int, probeMod: Int = 97): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // probe side, corpus side, dlen, dfreq
    val dlen = tf.groupBy("doc_id").agg(sum("cnt").as("doc_len"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val stats = dlen.agg(sum("doc_len").as("big_l"),
      count(lit(1)).as("n_docs"))
    val corpus = tf.join(dlen, "doc_id").join(dfreq, "token")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("token"),
        expr("""((1000000 * (2*(n_docs - df) + 1)) DIV (2*df + 1)
               | * ((880000000 * cnt * big_l)
               |    DIV (400 * cnt * big_l + 120 * big_l + 360 * doc_len * n_docs)))
               | DIV 1000000
               |""".stripMargin.replace("\n", " ")).as("term_e6"))
    val probes = tf.filter(col("doc_id") % probeMod === 0)
      .select(col("doc_id").as("q_id"), col("token")).distinct()
    val win = Window.partitionBy("q_id")
      .orderBy(col("score_e6").desc, col("doc_id"))
    corpus.join(broadcast(probes), "token")
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy("q_id", "doc_id")
      .agg(sum("term_e6").as("score_e6"))
      .withColumn("rnk", row_number().over(win).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher, k=60) of two
    * ranked lists keyed (q_id, doc_id, rnk): each list contributes
    * `1000000 DIV (rrfK + rnk)` — exact integer division on positive
    * operands, so both engines floor identically — and a doc missing
    * from one list contributes 0 from it. Output re-ranked to the
    * fused top `k` per q_id, ties to the lower doc_id.
    *
    * Scale: both inputs are bounded at |probes|·k rows by their
    * rankers, so the full-outer fusion join and the final window are
    * asymptotically free next to either ranking leg.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, rrfK: Int = 60): DataFrame = {
    val ca = a.select(col("q_id"), col("doc_id"),
      expr(s"1000000 DIV ($rrfK + rnk)").as("contrib_a"))
    val cb = b.select(col("q_id"), col("doc_id"),
      expr(s"1000000 DIV ($rrfK + rnk)").as("contrib_b"))
    val win = Window.partitionBy("q_id")
      .orderBy(col("rrf_e6").desc, col("doc_id"))
    ca.join(cb, Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"),
        (coalesce(col("contrib_a"), lit(0L)) +
          coalesce(col("contrib_b"), lit(0L))).as("rrf_e6"))
      .withColumn("rnk", row_number().over(win).cast("long"))
      .filter(col("rnk") <= k)
  }
}

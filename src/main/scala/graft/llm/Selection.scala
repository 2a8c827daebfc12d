package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.llm.{TextFunctions => TF}

/** Data SELECTION for training mixtures: importance resampling over
  * hashed n-gram features (the DSIR recipe — Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling": score
  * every raw document by how much more likely its n-grams are under a
  * target-domain bag-of-hashed-ngrams model than under the raw-corpus
  * model, then keep the top-scoring docs).
  *
  * This is the e6-INTEGER variant: per-bucket weights are differences
  * of e6-floored integer frequencies rather than log-likelihood
  * ratios, so every score is exact integer arithmetic — bit-identical
  * in any engine (`ln` is not correctly rounded in IEEE 754, so a
  * log-ratio would hash-diverge cross-engine; frequency differences
  * rank monotonically the same way for the near-uniform feature
  * distributions hashing produces).
  *
  * Scale shape (the point of the design):
  *   - the weight TABLE is fixed-size (`buckets` longs — a few KB,
  *     like an IVF codebook), built by ONE aggregation scan with
  *     map-side combine (shuffle ∝ buckets, not grams) and collected
  *     to the driver under the same bounded-collect contract as the
  *     centroid paths ([[Similarity]]);
  *   - scoring then FUSES INTO THE SCAN: the weights ride in the
  *     projection as a literal array, each doc folds its gram buckets
  *     through `aggregate` — no join, no shuffle, no second pass over
  *     the corpus; top-k is `TakeOrderedAndProject` (per-partition
  *     top-N, driver merge of N·partitions rows).
  */
object Selection {

  /** Per-bucket e6-integer importance weights
    * `floor(1e6·tc_b/tt) − floor(1e6·rc_b/rt)` from one conditional
    * aggregation over the corpus' word-bigram buckets. `targetPred`
    * marks the target-domain rows; everything else is the raw pool.
    * Long division truncates and every operand is nonnegative, so
    * DuckDB's floor-division `//` reproduces each weight exactly.
    */
  def importanceWeights(docs: DataFrame, targetPred: Column,
                        buckets: Int = 4096,
                        textCol: String = "text"): Array[Long] = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // the native shingle_gen generator instead of the composed
    // explode(wordShingles(...)) — same grams (ShingleGenSpec pins
    // parity), one tokenize per row, no interpreted per-gram lambdas
    val rows = docs
      .select(targetPred.as("is_t"),
        expr(s"shingle_gen($textCol, 2)"))
      .select(col("is_t"),
        pmod(TF.hash60(col("shingle")), lit(buckets.toLong)).as("b"))
      .groupBy("b")
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("tc"),
        sum(when(!col("is_t"), 1L).otherwise(0L)).as("rc"))
      .collect()
    val tc = new Array[Long](buckets)
    val rc = new Array[Long](buckets)
    rows.foreach { r =>
      tc(r.getLong(0).toInt) = r.getLong(1)
      rc(r.getLong(0).toInt) = r.getLong(2)
    }
    val tt = tc.sum
    val rt = rc.sum
    require(tt > 0, "target side has no grams — check targetPred")
    require(rt > 0, "raw side has no grams — check targetPred")
    // 1e6·count must stay in a Long: loud precondition instead of a
    // silent wrap at ~9.2e12 grams per side (the fix at that scale is
    // counting in units of, say, 64 grams — not silently wrong weights)
    require(tt <= Long.MaxValue / 1000000L && rt <= Long.MaxValue / 1000000L,
      s"gram counts too large for e6 integer frequencies: tt=$tt rt=$rt")
    Array.tabulate(buckets)(b => 1000000L * tc(b) / tt - 1000000L * rc(b) / rt)
  }

  /** Per-document importance scores against a literal weight table:
    * `(idCol, n_grams, score_e6)` for every doc with at least one
    * bigram. Pure projection — the only plan nodes over the corpus
    * are scan → filter → project.
    */
  def importanceScores(docs: DataFrame, weights: Array[Long],
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val buckets = weights.length
    val wLit = typedLit(weights.toSeq)
    docs
      // STAGED projections: the token array must be a materialized
      // attribute before the shingle lambda consumes it. The previous
      // inline `wordShingles(tokens(text))` captured the split()
      // EXPRESSION inside the (interpreted) transform lambda, so every
      // element_at re-ran split(text) — O(tokens²) per document, the
      // exact trap importanceWeights' scaladoc documents (measured
      // 3.3 s → 0.6 s on the sf0.1 bench entry). CollapseProject
      // leaves the boundary alone because the alias is non-cheap and
      // multiply-referenced; values are unchanged (same grams, same
      // hashes — x75's oracle hash pins it).
      .select(col(idCol), TF.tokens(col(textCol)).as("toks"))
      // ≡ size(bs) >= 1 (a w=2 shingle exists iff ≥2 tokens), but
      // keyed on the TOKEN count: the old bs-sized filter was pushed
      // below the projections and re-ran the whole inline shingle
      // expression per row just to test emptiness
      .filter(size(col("toks")) >= 2)
      .select(col(idCol), TF.wordShingles(col("toks"), 2).as("grams"))
      .select(col(idCol),
        transform(col("grams"),
          g => pmod(TF.hash60(g), lit(buckets.toLong))).as("bs"))
      .select(col(idCol), size(col("bs")).cast("long").as("n_grams"),
        aggregate(col("bs"), lit(0L),
          (acc, b) => acc + element_at(wLit, (b + 1L).cast("int"))).as("score_e6"))
  }
}

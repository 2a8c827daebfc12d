package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (builder brief: brute-force cosine
  * top-k baseline + a bucketed approximate variant as the scale path).
  * Vectors are `array<float>` columns; all arithmetic is done in
  * double via codegen'd higher-order functions — no UDFs.
  */
object Similarity {

  /** Left-fold dot product in double (deterministic summation order —
    * matches the oracle's list_reduce bit-for-bit).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity scaled to e6 and floored to a long (exact
    * cross-engine comparison — no float hashing).
    */
  def cosineE6(a: Column, b: Column): Column =
    floor(lit(1000000.0) * dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))))
      .cast("long")

  /** Brute-force cosine top-k: every probe against the whole corpus.
    *
    * Scale: the probe set is broadcast (small by definition — it's a
    * query batch), so the corpus is scanned once with NO shuffle of
    * the big side; the only shuffle is the per-probe top-k window over
    * |probes|·k candidates... which first requires scoring |probes|·n
    * rows. That linear scan is the baseline's cost — the honest
    * comparison point for the bucketed variant below.
    */
  def bruteTopK(corpus: DataFrame, probes: DataFrame, k: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("p_vec"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos_e6").desc, col(idCol))
    corpus.crossJoin(broadcast(p))
      .filter(col(idCol) =!= col("probe_id"))
      .withColumn("cos_e6", cosineE6(col("p_vec"), col(vecCol)))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col(idCol).as("neighbor_id"), col("cos_e6"), col("rnk"))
  }

  /** Brute-force top-k via the bounded [[graft.functions.TopKAggregator]]
    * instead of a ranking window: per-group state is capped at k
    * BEFORE the shuffle (map-side partial aggregation), so the
    * exchange carries |probes|·k rows, not every scored candidate —
    * the window variant ([[bruteTopK]]) must shuffle + sort them all.
    * Same results; kept separately as the typed-Aggregator surface.
    */
  def bruteTopKAgg(corpus: DataFrame, probes: DataFrame, k: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.{Scored, TopKAggregator}
    implicit val scoredEnc: org.apache.spark.sql.Encoder[Scored] =
      org.apache.spark.sql.Encoders.product[Scored]
    // untyped udaf() keeps the aggregation inside the regular hash-agg
    // plan — a groupByKey/mapValues typed pipeline would deserialize
    // every candidate row into objects first (measured ~10× slower)
    val topk = udaf(new TopKAggregator(k))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("p_vec"))
    corpus.crossJoin(broadcast(p))
      .filter(col(idCol) =!= col("probe_id"))
      .select(col("probe_id"),
        cosineE6(col("p_vec"), col(vecCol)).as("score"),
        col(idCol).as("id"))
      .groupBy("probe_id")
      .agg(topk(col("score"), col("id")).as("tops"))
      .select(col("probe_id"), posexplode(col("tops")).as(Seq("pos", "t")))
      .select(col("probe_id"), col("t.id").as("neighbor_id"),
        col("t.score").as("cos_e6"), (col("pos") + 1).cast("long").as("rnk"))
  }

  /** Sign-bucket LSH code: bit j set iff component j ≥ 0. With
    * axis-aligned hyperplanes this is the simplest random-projection
    * LSH; `planes` bits → 2^planes buckets.
    */
  def signBucket(vec: Column, planes: Int = 8): Column =
    (0 until planes).map { j =>
      when(element_at(vec, j + 1) >= 0f, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Embedding-cosine near-duplicate pairs, LSH-bucketed: only pairs
    * sharing a sign bucket are scored (all-pairs-free), emitting
    * (a < b, cos_e6 >= threshold).
    *
    * Scale: one equi-join shuffle on the bucket code; candidate count
    * is Σ bucket² / 2 ≈ n²/2^planes — raise `planes` as n grows to
    * hold the per-bucket quadratic cost down, and add rotated plane
    * sets (multi-table LSH) to recover recall. Recall is bounded by
    * bucket agreement: a near-dup pair split by one sign flip is
    * missed — the standard LSH trade, stated rather than hidden.
    */
  def bucketedNearDupPairs(corpus: DataFrame, minCosE6: Long,
                           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val withBucket = corpus.withColumn("bucket", signBucket(col(vecCol)))
    val a = withBucket.select(col(idCol).as("vec_a"), col(vecCol).as("va"), col("bucket"))
    val b = withBucket.select(col(idCol).as("vec_b"), col(vecCol).as("vb"),
      col("bucket").as("bucket_b"))
    a.join(b, col("bucket") === col("bucket_b") && col("vec_a") < col("vec_b"))
      .withColumn("cos_e6", cosineE6(col("va"), col("vb")))
      .filter(col("cos_e6") >= minCosE6)
      .select("vec_a", "vec_b", "bucket", "cos_e6")
  }

  /** IVF-style approximate top-k: a small set of coarse centroids
    * partitions the corpus (assignment = argmax cosine, the coarse
    * quantizer); each probe searches only its own cluster's inverted
    * list. Centroids here are deterministic samples (random-init IVF
    * without Lloyd refinement — refinement changes constants, not the
    * plan shape).
    *
    * Scale: centroids broadcast twice (corpus assignment + probe
    * assignment — n·K cheap scores, no shuffle), then ONE equi-join
    * shuffle on cluster id. Cost per probe drops from n to n/K on
    * balanced clusters; skewed clusters are AQE's skew-join case and
    * the standard fix is more centroids + multi-probe (search the
    * top-p clusters), which is this same plan with p candidate
    * cluster ids exploded per probe.
    */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, centroids: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = broadcast(
      centroids.select(col(idCol).as("cent_id"), col(vecCol).as("c_vec")))

    def assign(df: DataFrame, outIdCol: String, outVecCol: String): DataFrame = {
      val w = Window.partitionBy(outIdCol)
        .orderBy(col("c_score").desc, col("cent_id"))
      df.select(col(idCol).as(outIdCol), col(vecCol).as(outVecCol))
        .crossJoin(cents)
        .withColumn("c_score", cosineE6(col(outVecCol), col("c_vec")))
        .withColumn("c_rnk", row_number().over(w))
        .filter(col("c_rnk") === 1)
        .select(col(outIdCol), col(outVecCol), col("cent_id").as("cluster"))
    }

    val assigned = assign(corpus, "neighbor_id", "n_vec")
    val p = assign(probes, "probe_id", "p_vec")
    val w = Window.partitionBy("probe_id").orderBy(col("cos_e6").desc, col("neighbor_id"))
    assigned.join(p, Seq("cluster"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .withColumn("cos_e6", cosineE6(col("p_vec"), col("n_vec")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("cluster"), col("cos_e6"), col("rnk"))
  }

  /** Bucketed approximate top-k: probes only score corpus vectors in
    * their own sign bucket — the recall/cost trade of LSH-ANN.
    *
    * Scale: ONE equi-join shuffle on the bucket code instead of a full
    * scan per probe; cost drops by ~2^planes. Bucket skew (real
    * embedding distributions are anisotropic) is AQE's skew-join case;
    * production would rotate with several plane sets (multi-table
    * LSH) and union candidates — same plan shape, more joins.
    */
  def bucketedTopK(corpus: DataFrame, probes: DataFrame, k: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.withColumn("bucket", signBucket(col(vecCol)))
    val p = probes
      .select(col(idCol).as("probe_id"), col(vecCol).as("p_vec"))
      .withColumn("bucket", signBucket(col("p_vec")))
    val w = Window.partitionBy("probe_id").orderBy(col("cos_e6").desc, col(idCol))
    c.join(p, Seq("bucket"))
      .filter(col(idCol) =!= col("probe_id"))
      .withColumn("cos_e6", cosineE6(col("p_vec"), col(vecCol)))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col(idCol).as("neighbor_id"), col("bucket"),
        col("cos_e6"), col("rnk"))
  }
}

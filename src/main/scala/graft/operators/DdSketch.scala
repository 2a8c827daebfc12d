package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DDSketch-style relative-error quantile summaries (Masson/Rim/Lee,
  * VLDB'19 — the sketch behind Datadog's distribution metrics), as
  * plain Spark relational operators: a value lands in log-bucket
  * ceil(ln(v)/ln(γ)), so every bucket spans a γ-factor and the bucket
  * midpoint estimator is within α = (γ−1)/(γ+1) RELATIVE error of any
  * value it covers — the guarantee rank-error sketches (q27's
  * percentile_approx) cannot give for long-tailed latency/price
  * distributions, where p99 lives exactly where absolute-rank summaries
  * are loosest.
  *
  * The sketch IS a tiny relation: one (key, bucket, cnt) row per
  * occupied bucket, at most ln(max/min)/ln(γ) rows per key (~275 for
  * integer cents up to 50k at γ=1.04) whatever the input size. That
  * buys the three properties a 100 TB rollup needs with no custom
  * state format:
  *   - build is one partial-aggregated groupBy (map-side combine does
  *     the heavy counting; the exchange carries buckets, not rows);
  *   - partials persist as ordinary parquet and MERGE BY SUM — the
  *     same lifecycle as q55's HLL rollup (day → month → year reads
  *     sketch-sized inputs, never the corpus);
  *   - quantile extraction is a cumulative walk over ≤275 rows per
  *     key: the smallest bucket whose cumulative count reaches the
  *     ceil(q·n) target rank, all integer arithmetic (q as e6 parts).
  *
  * [[quantiles]] runs the same walk over ANY (key, value-like, cnt)
  * relation, so the identity "sketch" (bucket = the exact value)
  * yields the exact discrete quantile with the same code path — which
  * is what q56's oracle cross-checks engine-to-engine, with the
  * sketch estimate folded to a within-α predicate on top.
  */
object DdSketch {

  /** Log-bucket index for a positive value: ceil(ln(v)/ln(γ)).
    * Callers own mapping zero/negative values to a reserved bucket
    * (the testdata's integer cents are ≥ 1, where idx ≥ 0).
    */
  def bucketIdx(v: Column, gamma: Double): Column =
    ceil(log(v.cast("double")) / lit(math.log(gamma))).cast("long")

  /** Midpoint estimator for bucket i: 2γ^i/(γ+1), within
    * α = (γ−1)/(γ+1) relative error of every value the bucket covers.
    */
  def bucketValue(idx: Column, gamma: Double): Column =
    lit(2.0) * pow(lit(gamma), idx.cast("double")) / lit(gamma + 1.0)

  /** Build the sketch: one (keys..., bucket, cnt) row per occupied
    * log-bucket. One partial-aggregated shuffle; output is
    * bucket-bounded regardless of input rows.
    */
  def sketch(df: DataFrame, keys: Seq[String], valueCol: String,
             gamma: Double): DataFrame =
    df.groupBy(keys.map(col) :+ bucketIdx(col(valueCol), gamma).as("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge partial sketches over `keys` (collapsing any finer
    * partition columns the partials carried): counts ADD, which is the
    * whole merge — associative, commutative, and loss-free, so merged
    * partials are bit-identical to a single-pass sketch.
    */
  def merge(partials: DataFrame, keys: Seq[String]): DataFrame =
    partials.groupBy(keys.map(col) :+ col("bucket"): _*)
      .agg(sum("cnt").as("cnt"))

  /** Extract quantiles from a (keys..., bucket, cnt) relation: for
    * each q (e6 parts), the smallest bucket whose cumulative count
    * reaches the target rank ceil(q·n). Returns one row per
    * (keys..., qe6) with `n` and the chosen `bucket`. The per-key
    * window sorts ≤ bucket-count rows — this is the ONLY ordered step
    * and it runs on sketch-sized data. Feeding the identity relation
    * (bucket = exact value) yields the exact discrete quantile.
    */
  def quantiles(sk: DataFrame, keys: Seq[String],
                qsE6: Seq[Long]): DataFrame = {
    val kcols = keys.map(col)
    val w = Window.partitionBy(kcols: _*).orderBy("bucket")
    val cum = sk
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(Window.partitionBy(kcols: _*)))
      .withColumn("qe6", explode(array(qsE6.map(lit): _*)))
    cum
      .groupBy(kcols :+ col("qe6"): _*)
      .agg(max("n").as("n"),
        min(when(col("cum") >=
          expr("(n * qe6 + 999999) DIV 1000000"), col("bucket")))
          .as("bucket"))
  }
}

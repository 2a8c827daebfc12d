package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted two-stage aggregation for skewed group keys (builder brief
  * "salting for skew"): a hot key that would funnel every row into one
  * reducer is spread across `salt` sub-keys for the wide first stage;
  * the second stage combines the (tiny — |keys|·|salts| rows) per-salt
  * partials. Results are provably identical to the direct aggregation
  * because every supported aggregate is associative-commutative —
  * which is exactly what makes it saltable; avg is NOT, so it travels
  * as sum+count and is reconstructed after the merge (same division
  * Spark's own Average performs).
  *
  * Scale: stage 1 shuffles on (keys, salt) — uniform by construction
  * when the salt expression spreads the hot key (a row-level value
  * like an id modulo works; a constant doesn't). Stage 2 shuffles
  * |keys|·|salts| partial rows — negligible. This is the manual
  * escape hatch for skew that AQE's skew handling doesn't cover
  * (AQE splits skewed JOIN partitions, not skewed aggregation keys;
  * partial map-side aggregation already helps but still funnels all
  * distinct (key) groups of the hot key into one final reducer task
  * when a single key dominates post-combine).
  */
object SaltedAgg {

  /** One output aggregate of the salted contract. `out` is the result
    * column name (alias both here and in any oracle SQL).
    */
  sealed trait Agg { def out: String }
  final case class Sum(in: String, out: String) extends Agg
  final case class Count(out: String) extends Agg
  final case class Min(in: String, out: String) extends Agg
  final case class Max(in: String, out: String) extends Agg
  /** Reconstructed as sum/count after the merge — identical to
    * Spark's Average on integral inputs; on floating inputs the
    * summation order differs from the direct plan exactly as any
    * distributed avg already differs run-to-run.
    */
  final case class Avg(in: String, out: String) extends Agg
  /** Sorted distinct-value array — equivalent to
    * `array_sort(collect_set(in))` on the direct plan. THIS is the
    * aggregate class where salting actually pays at scale: sum/count
    * partials collapse to one row per (key, partition) under map-side
    * combine, so a hot key costs the final reducer almost nothing —
    * but collect_set partial STATE is proportional to the key's
    * distinct values, and the unsalted plan ships every partition's
    * hot-key set to ONE task to merge. The salted first stage merges
    * per (key, salt) across `salts` tasks; the second stage folds
    * `salts` already-deduped arrays. (ScaleSmoke's skew stage
    * measures exactly this separation on a Zipf corpus.)
    */
  final case class CollectSet(in: String, out: String) extends Agg

  /** Two-stage salted groupBy: `groupBy(keys :+ salt).agg(partials)`
    * then `groupBy(keys).agg(merged)`. `salt` must be a deterministic
    * row-level expression (e.g. `col("event_id") % 16`).
    */
  def aggregate(df: DataFrame, keys: Seq[String], salt: Column, aggs: Seq[Agg]): DataFrame = {
    require(keys.nonEmpty, "salted aggregation needs at least one group key")
    require(aggs.nonEmpty, "salted aggregation needs at least one aggregate")

    val partials: Seq[Column] = aggs.flatMap {
      case Sum(in, out) => Seq(sum(in).as(s"__ps_$out"))
      case Count(out) => Seq(count(lit(1)).as(s"__pn_$out"))
      case Min(in, out) => Seq(min(in).as(s"__pmin_$out"))
      case Max(in, out) => Seq(max(in).as(s"__pmax_$out"))
      case Avg(in, out) => Seq(sum(in).as(s"__pas_$out"), count(lit(1)).as(s"__pac_$out"))
      case CollectSet(in, out) => Seq(collect_set(in).as(s"__pcs_$out"))
    }
    val merged: Seq[Column] = aggs.map {
      case Sum(_, out) => sum(s"__ps_$out").as(out)
      case Count(out) => sum(s"__pn_$out").as(out)
      case Min(_, out) => min(s"__pmin_$out").as(out)
      case Max(_, out) => max(s"__pmax_$out").as(out)
      case Avg(_, out) => (sum(s"__pas_$out") / sum(s"__pac_$out")).as(out)
      case CollectSet(_, out) =>
        array_sort(array_distinct(flatten(collect_list(s"__pcs_$out")))).as(out)
    }

    df.withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merged.head, merged.tail: _*)
  }

  /** Holistic-aggregate skew relief that [[aggregate]]'s CollectSet
    * CANNOT give (measured in ScaleSmoke's skew stage): a hot key's
    * distinct-value set is its own output, so any plan that assembles
    * it in one row pays one task for the whole set — salting the
    * computation still funnels the merge. The scalable form keeps the
    * OUTPUT sharded: values are routed to shards BY VALUE, so each
    * (key, shard) row holds a disjoint slice of the key's set, dedup
    * within a shard is exact, no cross-shard merge exists at all, and
    * the hot key costs `shards` parallel tasks bounded by |set|/shards.
    * Flattening a key's shards reproduces `array_sort(collect_set)`
    * exactly (disjointness makes the union concatenation — SaltingSpec
    * pins it); downstream consumers stream shard rows instead of
    * materializing monster arrays — the only shape that survives a
    * key whose set itself is executor-memory-sized.
    *
    * `shardExpr` must be a deterministic pure function of the VALUE
    * (e.g. `pmod(col("v"), lit(16))` or a hash of it) — a row-level
    * salt like [[aggregate]]'s would scatter duplicates across shards
    * and break the disjoint-union property.
    */
  def collectSetSharded(df: DataFrame, keys: Seq[String], valueCol: String,
                        shardExpr: Column, out: String): DataFrame =
    df.withColumn("__shard", shardExpr)
      .groupBy((keys :+ "__shard").map(col): _*)
      .agg(array_sort(collect_set(valueCol)).as(out))
}

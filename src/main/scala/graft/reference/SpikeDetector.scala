package graft.reference

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.IpFunctions

/** Tuning knobs of the spike analysis (hha.conf:26–30), plus the
  * opt-in "intended semantics" flags (SURVEY §7 decision:
  * bug-compatible by default, documented flags for the intended
  * behavior — both default OFF so every oracle-checked query stays
  * bug-for-bug with the reference):
  *
  * @param weightedNetRollup the reference's /24 roll-up averages the
  *   per-IP truncated averages (hha.py:162,167), weighting a 1-row IP
  *   equally with a 10k-row IP; ON computes the weighted mean
  *   (Σpkt/Σrows over the net — the mean over raw rows), derived from
  *   exact per-IP sum/count partials so the plan shape is unchanged.
  * @param newKeyAlertAtLimit the reference's `na.fill(limit)` makes a
  *   brand-new key alert only when `cur > quotient·limit`, which
  *   contradicts its own README ("if sum_val exceeds LimitNewData",
  *   README.md:93); ON alerts new keys at `cur > limit` as the prose
  *   intends. Known keys are unaffected.
  *
  * The third "intended" knob — bounded instead of open-ended windows
  * (the reference computes `endTime`s and never applies them,
  * hha.py:141,148,321,323) — needs no flag: the window predicates are
  * already injectable, so callers pass a closed interval (see
  * r09_spike_intended).
  */
final case class SpikeParams(
    quotientAmplification: Double = 3.0,
    limitNewData: Int = 2500,
    limitNewDataNet: Int = 3500,
    weightedNetRollup: Boolean = false,
    newKeyAlertAtLimit: Boolean = false
)

/** Traffic-spike detection — the reference's core analysis
  * (`FiltrDataByInterval`, hha.py:132–219) re-expressed as composable
  * Spark operators.
  *
  * Semantics replicated exactly (SURVEY.md §7 "hard parts"):
  *   - truncating `avg(CountPkt).cast(int)` (hha.py:143,149);
  *   - /24 roll-up is an average-of-truncated-averages, NOT a weighted
  *     mean (hha.py:162,167);
  *   - baseline clamp: per-IP requires `prev > limit` (hha.py:191),
  *     per-net does NOT (hha.py:177) — the asymmetry is intentional;
  *   - left-join nulls filled with the limit (hha.py:179,194), which
  *     encodes new-key detection: a brand-new key alerts only when
  *     `cur > quotient * limit`;
  *   - the alert row carries the *baseline* (`prev_sum_val2`) in its
  *     `sum_val` column (hha.py:199,210);
  *   - positional union of the per-IP and per-net branches
  *     (hha.py:213–214).
  *
  * One deliberate divergence: `dst_net` stays numeric (LongType /24
  * mask) instead of the reference's decimal string (hha.py:20) — joins
  * and unions stay numeric and codegen'd; see IpFunctions.
  *
  * Scale notes (100 TB design point): both window aggregates shuffle
  * once on (num_protocol, type_proto, dst_ip) with map-side partial
  * aggregation; the per-IP join reuses that exact partitioning (no
  * second shuffle); the /24 roll-up re-aggregates the already-small
  * key-level frame. AQE skew-join handles a hot attacked IP. The
  * aggregated frames are proportional to |distinct keys|, not input
  * rows, so everything after the first aggregation is cheap.
  */
object SpikeDetector {

  private val KeyCols = Seq("num_protocol", "type_proto")

  /** Truncating-average aggregate over one time window
    * (hha.py:143/149): groupBy(num_protocol, type_proto, key) →
    * avg(CountPkt) cast to int (truncated toward zero).
    */
  def aggregateWindow(hist: DataFrame, keyCol: String = "dst_ip"): DataFrame =
    hist
      .groupBy((KeyCols :+ keyCol).map(col): _*)
      .agg(avg("CountPkt").cast("int").as("sum_val"))
      .select(col("num_protocol"), col("type_proto"), col("sum_val"), col(keyCol))

  /** `prev_`-prefix every column, disambiguating the self-join
    * (hha.py:150, 168).
    */
  def prefixPrev(df: DataFrame): DataFrame =
    df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"prev_$c"))

  /** /24 roll-up (hha.py:160–168): derive the network key and
    * re-average the per-IP truncated averages (average-of-averages —
    * each /32 contributes equally, matching the reference).
    */
  def rollupNet(agg: DataFrame, ipCol: String = "dst_ip", netCol: String = "dst_net"): DataFrame =
    agg
      .withColumn(netCol, IpFunctions.ipToNet24(col(ipCol)))
      .groupBy((KeyCols :+ netCol).map(col): _*)
      .agg(avg("sum_val").cast("int").as("sum_val"))
      .select(col("num_protocol"), col("type_proto"), col("sum_val"), col(netCol))

  /** Left-outer 3-key join of the current window onto the previous
    * window, deriving the clamped baseline `prev_sum_val2`
    * (hha.py:170–194).
    *
    * @param requirePrevAboveLimit the per-IP branch clamps only when
    *   `prev > limit` (hha.py:191); the per-net branch clamps on ratio
    *   alone (hha.py:177).
    */
  def joinBaseline(
      cur: DataFrame,
      prev: DataFrame,
      keyCol: String,
      limit: Int,
      quotient: Double,
      requirePrevAboveLimit: Boolean
  ): DataFrame = {
    // cur and prev have disjoint column names (prev_ prefix), so plain
    // name refs are unambiguous even though both derive from one scan.
    val cond = KeyCols.:+(keyCol).map(k => col(k) === col(s"prev_$k")).reduce(_ && _)
    val ratioClamp = col("prev_sum_val") / col("sum_val") > quotient
    val clampWhen =
      if (requirePrevAboveLimit) ratioClamp && col("prev_sum_val") > limit
      else ratioClamp
    cur
      .join(prev, cond, "left")
      .select(
        col("num_protocol"),
        col("type_proto"),
        col("sum_val"),
        col(keyCol),
        col("prev_sum_val"),
        when(clampWhen, limit).otherwise(col("prev_sum_val")).as("prev_sum_val2")
      )
      .na.fill(limit, Seq("prev_sum_val", "prev_sum_val2"))
  }

  /** Spike filter + alert projection (hha.py:198–199, 209–210): fire
    * when current exceeds `quotient ×` baseline; the alert's `sum_val`
    * carries the baseline.
    */
  def spikes(joined: DataFrame, keyCol: String, quotient: Double): DataFrame =
    joined
      .filter(col("sum_val") / col("prev_sum_val2") > quotient)
      .select(
        col("num_protocol"),
        col("type_proto"),
        col("prev_sum_val2").as("sum_val"),
        col(keyCol)
      )

  /** Full pipeline (hha.py:132–219): window aggregates → per-IP and
    * per-/24 branches → baseline joins → spike filters → positional
    * union. Output columns: num_protocol, type_proto, sum_val, dst_ip
    * (the net branch's dst_ip carries the /24 network address).
    *
    * @param materialize cache the two window aggregates, which are
    *   each consumed twice (ip + net branches). This replaces the
    *   reference's RDD round-trip `recreateDF` hack (hha.py:119–128)
    *   with the idiomatic `cache()`. Off by default so oracle queries
    *   stay side-effect-free single plans.
    */
  def detect(
      hist: DataFrame,
      currentPredicate: Column,
      previousPredicate: Column,
      params: SpikeParams = SpikeParams(),
      materialize: Boolean = false
  ): DataFrame = {
    var cur = aggregateWindow(hist.filter(currentPredicate))
    var prev = prefixPrev(aggregateWindow(hist.filter(previousPredicate)))
    if (materialize) { cur = cur.cache(); prev = prev.cache() }

    val curNet = rollupNet(cur)
    val prevNet = rollupNet(
      prev.toDF("num_protocol", "type_proto", "sum_val", "dst_ip")
    ).transform(prefixPrev)

    val ipJoined = joinBaseline(cur, prev, "dst_ip", params.limitNewData,
      params.quotientAmplification, requirePrevAboveLimit = true)
    val netJoined = joinBaseline(curNet, prevNet, "dst_net", params.limitNewDataNet,
      params.quotientAmplification, requirePrevAboveLimit = false)

    val ipSpikes = spikes(ipJoined, "dst_ip", params.quotientAmplification)
    val netSpikes = spikes(netJoined, "dst_net", params.quotientAmplification)

    // Positional union (hha.py:213–214); the net leg's 4th column is
    // the /24 network carried under the dst_ip name.
    ipSpikes.union(netSpikes.withColumnRenamed("dst_net", "dst_ip"))
  }

  /** Same answers as [[detect]], better plan: ONE scan + ONE shuffle.
    *
    * Both window averages come from a single conditional aggregation
    * (`avg(when(pred, CountPkt))` — avg ignores the nulls, so each
    * side averages exactly the rows its window predicate admits), and
    * the reference's 3-key left self-join collapses into a filter on
    * `cur IS NOT NULL`: a key appears on the left of that join iff it
    * has current-window rows, with prev NULL iff it has none — the
    * exact frame the join produced. The /24 branches re-aggregate the
    * fused frame (null-ignoring avg again = per-window membership).
    *
    * At 100 TB this is the difference between 4 fact scans + 2 agg
    * shuffles + a join (or 2 scans + cache with [[detect]]'s
    * materialize) and one scan + one shuffle + small re-aggs —
    * equivalence is oracle-checked (r08) and property-tested against
    * [[detect]].
    */
  def detectFused(
      hist: DataFrame,
      currentPredicate: Column,
      previousPredicate: Column,
      params: SpikeParams = SpikeParams()
  ): DataFrame = {
    // exact sum/count partials ride along only when the weighted
    // roll-up is on — same single shuffle either way
    val baseAggs = Seq(
      avg(when(currentPredicate, col("CountPkt"))).cast("int").as("sum_val"),
      avg(when(previousPredicate, col("CountPkt"))).cast("int").as("prev_sum_val"))
    val weightAggs =
      if (params.weightedNetRollup) Seq(
        sum(when(currentPredicate, col("CountPkt"))).as("cur_sum"),
        count(when(currentPredicate, col("CountPkt"))).as("cur_cnt"),
        sum(when(previousPredicate, col("CountPkt"))).as("prev_sum"),
        count(when(previousPredicate, col("CountPkt"))).as("prev_cnt"))
      else Nil
    val allAggs = baseAggs ++ weightAggs
    val fused = hist
      .filter(currentPredicate || previousPredicate)
      .groupBy((KeyCols :+ "dst_ip").map(col): _*)
      .agg(allAggs.head, allAggs.tail: _*)

    def clampAndSpike(df: DataFrame, keyCol: String, limit: Int,
                      requirePrevAboveLimit: Boolean): DataFrame = {
      val ratioClamp = col("prev_sum_val") / col("sum_val") > params.quotientAmplification
      val clampWhen =
        if (requirePrevAboveLimit) ratioClamp && col("prev_sum_val") > limit
        else ratioClamp
      val alertCond =
        if (params.newKeyAlertAtLimit)
          // the README-prose semantics: brand-new keys (no previous
          // window → prev IS NULL before the fill) alert at cur > limit
          when(col("prev_sum_val").isNull, col("sum_val") > limit)
            .otherwise(col("sum_val") / col("prev_sum_val2") > params.quotientAmplification)
        else
          col("sum_val") / col("prev_sum_val2") > params.quotientAmplification
      df.filter(col("sum_val").isNotNull) // = the left side of the reference join
        .select(col("num_protocol"), col("type_proto"), col("sum_val"), col(keyCol),
          col("prev_sum_val"),
          when(clampWhen, limit).otherwise(col("prev_sum_val")).as("prev_sum_val2"))
        .na.fill(limit, Seq("prev_sum_val2"))
        .filter(alertCond)
        .select(col("num_protocol"), col("type_proto"),
          col("prev_sum_val2").as("sum_val"), col(keyCol))
    }

    // the /24 branch: bug-compatible = avg of the truncated per-IP
    // avgs; intended = weighted mean Σpkt/Σrows from the exact
    // partials (≡ the mean over raw rows, no second fact scan)
    val fusedNet = {
      val keyed = fused.withColumn("dst_net", IpFunctions.ipToNet24(col("dst_ip")))
        .groupBy((KeyCols :+ "dst_net").map(col): _*)
      if (params.weightedNetRollup)
        keyed.agg(
          (sum("cur_sum") / sum("cur_cnt")).cast("int").as("sum_val"),
          (sum("prev_sum") / sum("prev_cnt")).cast("int").as("prev_sum_val"))
      else
        keyed.agg(
          avg("sum_val").cast("int").as("sum_val"),
          avg("prev_sum_val").cast("int").as("prev_sum_val"))
    }

    clampAndSpike(fused, "dst_ip", params.limitNewData, requirePrevAboveLimit = true)
      .union(clampAndSpike(fusedNet, "dst_net", params.limitNewDataNet,
        requirePrevAboveLimit = false).withColumnRenamed("dst_net", "dst_ip"))
  }
}

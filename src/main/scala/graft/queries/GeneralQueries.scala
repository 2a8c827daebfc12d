package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, DdSketch, ZOrder}

/** General operator-inventory queries (SURVEY.md §2.2): aggregations,
  * joins (broadcast/semi/anti/range/as-of), windows, rollup/cube/
  * grouping-sets, set ops, pivot, string/date/json/array scalar
  * functions — over the TPC-H-ish testdata, each with a DuckDB oracle.
  *
  * Cross-engine determinism rules (see also tools/check.py):
  *   - money/metric doubles are quantized to exact integer units per
  *     row BEFORE aggregation (`round(x*10^s)` for decimal-valued money,
  *     `floor` for arbitrary reals) so sums are order-independent
  *     bigints that hash identically in Spark and DuckDB;
  *   - every aggregate in the oracle is CAST(... AS BIGINT) — DuckDB
  *     sum(BIGINT) yields HUGEINT which pandas renders float64;
  *   - window orderings always end in a unique key so ranks are total;
  *   - column names match the Spark side exactly (driver sorts columns
  *     by name before hashing).
  *
  * Scale notes are per-query in comments; the common theme: dimension
  * joins are broadcast, fact-fact joins shuffle on their equi-keys with
  * AQE handling skew, and aggregations are partial (map-side) by
  * construction since all are hash aggregates over low-cardinality keys.
  */
object GeneralQueries {

  /** round-to-cents as exact bigint: round(x * 10^s) */
  /** The part co-occurrence graph shared by q41/q44/q45: (order, part)
    * pairs and the undirected (a < b) distinct edge list between parts
    * appearing in the same order. One definition so the three graph
    * queries provably analyze the same graph.
    */
  private def coOccurrenceEdges(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val pairs = Tables.lineitem(s, d)
      .filter(col("l_linenumber") <= 4)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val und = pairs.as("x").join(pairs.as("y"), "l_orderkey")
      .filter(col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .distinct()
    (pairs, und)
  }

  private def asInt(c: Column, scale: Int): Column =
    round(c * math.pow(10, scale).toLong).cast("long")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2 aggregations — TPC-H Q1 pricing summary (sum/avg/count).
    // int64 headroom: sum_charge_e6 terms are ~1e13, exact below ~9e5
    // rows/group per 1e18 — i.e. ~1e12 rows/group at these magnitudes;
    // switch to decimal(38,0) beyond that.
    "q01_tpch_q1" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .select(
          col("l_returnflag"), col("l_linestatus"),
          asInt(col("l_quantity"), 0).as("qty"),
          asInt(col("l_extendedprice"), 2).as("price_c"),
          asInt(col("l_discount"), 2).as("disc_c"),
          asInt(col("l_tax"), 2).as("tax_c"))
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("qty").as("sum_qty"),
          sum("price_c").as("sum_base_price_c"),
          sum(col("price_c") * (lit(100L) - col("disc_c"))).as("sum_disc_price_e4"),
          sum(col("price_c") * (lit(100L) - col("disc_c")) * (lit(100L) + col("tax_c")))
            .as("sum_charge_e6"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // §2.2 joins — star join: 2 fact-fact shuffle joins + 2 broadcast
    // dims. At 100 TB the lineitem⋈orders shuffle is the only big
    // exchange; nation/region broadcast (25/5 rows at any SF).
    // int64 headroom: revenue_e4 accumulates ~1e9-per-row terms, so
    // per-nation sums stay exact only below ~9e9 rows/nation; past
    // that aggregate in decimal(38,0) (sum(cast(x as decimal(38,0)))).
    "q02_nation_revenue" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey"),
        asInt(col("l_extendedprice"), 2).as("price_c"),
        asInt(col("l_discount"), 2).as("disc_c"))
      val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val n = Tables.nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA").select("r_regionkey")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(
          sum(col("price_c") * (lit(100L) - col("disc_c"))).as("revenue_e4"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    // §2.2 sorts/limits — top-k per group via row_number window; at
    // scale this is a single shuffle on the partition key and each
    // group's sort is local (no global sort of the fact table).
    "q03_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("rn").cast("long").as("rn"),
          col("o_orderkey"), asInt(col("o_totalprice"), 2).as("price_c"))
        .orderBy("o_orderpriority", "rn")
    }),

    // §2.2 window functions — running frame + lag + rank in one pass
    // (one shuffle on o_custkey; all three windows share the sort).
    "q04_window_running" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("ord_sec"), col("o_orderkey"))
      val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("timestamp").cast("long").as("ord_sec"),
          asInt(col("o_totalprice"), 2).as("price_c"))
        .withColumn("running_c", sum("price_c").over(wr))
        .withColumn("prev_c", lag("price_c", 1).over(w))
        .withColumn("rn", row_number().over(w).cast("long"))
        .orderBy("o_custkey", "rn")
    }),

    // §2.2 grouping — ROLLUP with grouping_id
    "q05_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"), asInt(col("l_quantity"), 0).as("qty"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum("qty").as("sum_qty"), count(lit(1)).as("n"),
          grouping_id().cast("long").as("gid"))
        .orderBy("gid", "l_returnflag", "l_linestatus")
    }),

    // §2.2 grouping — CUBE with grouping_id
    "q06_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderpriority"), asInt(col("o_totalprice"), 2).as("price_c"))
        .cube("o_orderstatus", "o_orderpriority")
        .agg(sum("price_c").as("sum_price_c"), count(lit(1)).as("n"),
          grouping_id().cast("long").as("gid"))
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    }),

    // §2.2 aggregations — exact distinct count (expands to a two-phase
    // agg; partials keep the shuffle proportional to distinct keys).
    "q07_distinct_agg" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          countDistinct("user_id").as("n_users"),
          count(lit(1)).as("n_events"),
          round(min("value") * 100).cast("long").as("min_value_c"),
          round(max("value") * 100).cast("long").as("max_value_c"))
        .orderBy("event_type")
    }),

    // §2.2 set ops — INTERSECT then EXCEPT (both distinct semantics)
    "q08_setops" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val y96 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
      val y97 = o.filter(year(col("o_orderdate")) === 1997).select("o_custkey")
      val pend = o.filter(col("o_orderstatus") === "P").select("o_custkey")
      y96.intersect(y97).except(pend).orderBy("o_custkey")
    }),

    // §2.2 joins — left-semi + left-anti as one tagged union; the
    // probe side is broadcast when small, else a shuffled semi-join
    // that never materializes the match multiplicity.
    "q09_semi_anti" -> ((s, d) => {
      val bigli = Tables.lineitem(s, d).filter(col("l_quantity") > 49).select("l_partkey")
      val p = Tables.part(s, d)
      val semi = p.join(bigli, col("p_partkey") === col("l_partkey"), "left_semi")
        .select(col("p_partkey"), lit("has_big").as("tag"))
      val anti = p.join(bigli, col("p_partkey") === col("l_partkey"), "left_anti")
        .select(col("p_partkey"), lit("no_big").as("tag"))
      semi.union(anti).orderBy("p_partkey")
    }),

    // §2.2 joins — equi + range predicate (band join): equi key carries
    // the shuffle, the range is a post-join filter, so no cross product.
    "q10_range_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate").cast("timestamp").cast("long").as("osec"))
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_shipdate").cast("timestamp").cast("long").as("ssec"),
          asInt(col("l_quantity"), 0).as("qty"))
      li.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("ssec") >= col("osec") && col("ssec") < col("osec") + lit(30L * 86400))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_early"), sum("qty").as("qty_early"))
        .orderBy("o_orderkey")
    }),

    // §2.2 joins — backward as-of join (operators.AsOfJoin: one shuffle
    // union + running window, no range explosion). Right side is
    // pre-deduped on (key, time) for a deterministic match.
    "q11_asof_join" -> ((s, d) => {
      val r = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").cast("timestamp").cast("long").as("ord_sec"))
        .agg(max("o_orderkey").as("o_orderkey"))
      val l = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), Tables.tsSec.as("evt_sec"))
      AsOfJoin.backward(l, r, Seq("user_id"), "evt_sec", "ord_sec")
        .orderBy("event_id")
    }),

    // §2.2 scalar functions — string suite (all codegen'd built-ins)
    "q12_string_funcs" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("name_u"),
        substring(col("p_name"), 1, 8).as("name_pre"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).cast("long").as("brand_num"),
        concat_ws("|", col("p_type"), col("p_brand")).as("type_brand"),
        split(col("p_name"), " ").getItem(0).as("first_word"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"))
        .orderBy("p_partkey")
    }),

    // §2.2 scalar functions — date suite + monthly aggregation
    "q13_date_funcs" -> ((s, d) => {
      Tables.orders(s, d)
        .select(
          date_trunc("month", col("o_orderdate")).cast("long").as("month_sec"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          quarter(col("o_orderdate")).as("q"),
          asInt(col("o_totalprice"), 2).as("price_c"))
        .groupBy("month_sec", "y", "m", "q")
        .agg(sum("price_c").as("rev_c"), count(lit(1)).as("n"))
        .orderBy("month_sec")
    }),

    // §2.2 scalar functions — JSON extraction over events.props
    "q14_json" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"),
          count(when(col("k") > 50, 1)).as("n_big"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // §2.2 scalar functions — array higher-order functions over the
    // embedding column, quantized with floor (tie-free cross-engine).
    "q15_array_funcs" -> ((s, d) => {
      val q = transform(col("embedding"), x => floor(x.cast("double") * 1000000))
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        aggregate(q, lit(0L), (a, x) => a + x).as("sum_e6"),
        array_min(q).as("min_e6"),
        array_max(q).as("max_e6"),
        element_at(q, 1).as("first_e6"))
        .orderBy("vec_id")
    }),

    // §2.2 grouping — GROUPING SETS via the SQL surface
    "q16_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"), asInt(col("l_quantity"), 0).as("qty"))
        .createOrReplaceTempView("li_gs")
      s.sql(
        """SELECT l_returnflag, l_linestatus, sum(qty) AS sum_qty, count(*) AS n
          |FROM li_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    }),

    // §2.2 pivot — conditional aggregation to fixed columns
    "q17_pivot" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0)
        .orderBy("o_orderpriority")
    }),

    // Value-distribution histogram (the reference's namesake): fixed
    // -width binning + per-bin aggregates. One hash-agg shuffle over
    // |bins| keys regardless of input size.
    "q19_histogram" -> ((s, d) => {
      Tables.events(s, d)
        .select(floor(col("value") / 5.0).cast("long").as("bucket"),
          asInt(col("value"), 2).as("value_c"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum("value_c").as("sum_c"))
        .orderBy("bucket")
    }),

    // Gap-based sessionization: lag + running sum assigns session ids,
    // then per-session aggregates. One shuffle on user_id; each
    // user's timeline sorts locally (the standard distributed
    // sessionize — no driver loops, no cross-user coupling).
    "q20_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("evt_sec", "event_id")
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), Tables.tsSec.as("evt_sec"))
        .withColumn("new_sess",
          when(col("evt_sec") - lag("evt_sec", 1).over(byUser) > 1800L, 1L)
            .otherwise(when(lag("evt_sec", 1).over(byUser).isNull, 1L).otherwise(0L)))
        .withColumn("session_id", sum("new_sess").over(run))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min("evt_sec").as("start_sec"), max("evt_sec").as("end_sec"))
        .orderBy("user_id", "session_id")
    }),

    // Deterministic hash sampling (dataset curation): the sample is a
    // pure function of the row key — reproducible across runs,
    // engines, and cluster sizes, unlike rand()-based sampling; the
    // predicate pushes into the scan stage (no shuffle to sample).
    "q21_hash_sample" -> ((s, d) => {
      val key = concat_ws("-", col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, d)
        .filter(graft.llm.TextFunctions.hash60(key) % 100 < 7) // 7% sample
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_sampled"),
          sum(asInt(col("l_quantity"), 0)).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // Map-typed columns: parse JSON into map<string,long>, enrich via
    // map_concat, explode entries to rows (generator through codegen).
    "q23_map_explode" -> ((s, d) => {
      import org.apache.spark.sql.types.{LongType, MapType, StringType}
      Tables.events(s, d)
        .select(col("event_id"),
          map_concat(
            from_json(col("props"), MapType(StringType, LongType)),
            map(lit("value_c"), asInt(col("value"), 2))).as("m"))
        .select(col("event_id"), explode(col("m")).as(Seq("key", "val")))
        .orderBy("event_id", "key")
    }),

    // Multiset set ops — INTERSECT ALL / EXCEPT ALL (multiplicity-
    // preserving variants of q08's distinct set ops).
    "q24_multiset_ops" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val y96 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
      val y97 = o.filter(year(col("o_orderdate")) === 1997).select("o_custkey")
      y96.intersectAll(y97)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_common"))
        .join(
          y96.exceptAll(y97)
            .groupBy("o_custkey").agg(count(lit(1)).as("n_only96")),
          Seq("o_custkey"), "full_outer")
        .na.fill(0L, Seq("n_common", "n_only96"))
        .orderBy("o_custkey")
    }),

    // Skew-safe aggregation via the reusable SaltedAgg operator:
    // event_type has 5 values over the whole events table — the
    // canonical hot-key shape. The two-stage salted plan spreads each
    // key across 16 sub-keys before the merge; answers are provably
    // identical to the direct groupBy (SaltingSpec), so one oracle
    // covers both the operator and the routing. The CollectSet
    // aggregate (r9) is the class where salting actually pays —
    // per-key state grows with distinct values, so the unsalted final
    // merge funnels the hot key's whole set into one task (measured
    // on a Zipf corpus in ScaleSmoke's skew stage); folded to a
    // sorted joined string because the driver gate compares scalars.
    "q25_salted_agg" -> ((s, d) => {
      import graft.operators.SaltedAgg
      SaltedAgg.aggregate(
          Tables.events(s, d).withColumn("uid_bucket", col("user_id") % 50),
          keys = Seq("event_type"),
          salt = col("event_id") % 16,
          aggs = Seq(
            SaltedAgg.Sum("user_id", "sum_uid"), SaltedAgg.Count("n_events"),
            SaltedAgg.Min("event_id", "min_eid"), SaltedAgg.Max("event_id", "max_eid"),
            SaltedAgg.CollectSet("uid_bucket", "uniq_uid_buckets")))
        .withColumn("uniq_uid_buckets", concat_ws(",", col("uniq_uid_buckets")))
        .orderBy("event_type")
    }),

    // The NATIVE as-of join (custom LogicalPlan → planner Strategy →
    // streaming-merge SparkPlan, registered via SparkSessionExtensions):
    // identical workload and oracle as q11, so the driver gate proves
    // the custom physical operator matches DuckDB's ASOF LEFT JOIN
    // end to end. Column order differs from q11 (left cols then right
    // time+payload); the driver compares by sorted column name.
    "q26_asof_native" -> ((s, d) => {
      val r = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").cast("timestamp").cast("long").as("ord_sec"))
        .agg(max("o_orderkey").as("o_orderkey"))
      val l = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), Tables.tsSec.as("evt_sec"))
      AsOfJoin.backwardNative(l, r, Seq("user_id"), "evt_sec", "ord_sec")
        .orderBy("event_id")
    }),

    // As-of variants (VERDICT r4 missing #5): the FORWARD direction —
    // next order at or after each event. DuckDB's ASOF is
    // backward-only, but forward is backward on NEGATED times, so the
    // oracle still hash-gates it. Same single-shuffle union engine as
    // q11.
    // Stratified deterministic sampling — per-stratum rates over one
    // scan with a seeded hash instead of rand() (reproducible across
    // retries/executors, and DuckDB can mirror it exactly, which no
    // rand()-based sample allows). Embarrassingly parallel: the keep
    // decision is a per-row codegen'd expression, no shuffle before
    // the presentation sort; at 100 TB this is the only sampling shape
    // that needs neither a count pass nor driver state.
    "q31_stratified_sample" -> ((s, d) => {
      val rate = when(col("lang") === "en", 50L)
        .when(col("lang") === "fr", 25L)
        .otherwise(10L)
      Tables.documents(s, d)
        .withColumn("rate_pct", rate)
        .filter(graft.llm.TextFunctions.hash60(
          concat_ws(":", col("lang"), col("doc_id").cast("string"))) % 100 < col("rate_pct"))
        .select("doc_id", "lang", "source", "n_chars", "rate_pct")
        .orderBy("doc_id")
    }),

    // Z-order (Morton) key over two dimensions — the layout-optimizer
    // primitive (operators/ZOrder.zkey): pure codegen'd bit
    // interleaving, no shuffle before the presentation sort. The
    // layout WRITE and its multi-dim file-skipping payoff are proven
    // in ZOrderSpec; this query hash-gates the key arithmetic itself
    // (both engines compute the identical interleave from the shared
    // constants, like the simhash/minhash oracles).
    "q32_zorder_key" -> ((s, d) => {
      // zkeySql's contract: inputs PRE-range-reduced to [0, 2^bits) —
      // zkey's clamp and SQL's bit-slice agree only then (raw user_id
      // broke this exactly when ids crossed 1024, i.e. only at sf0.1+)
      val zx = col("user_id") % 1024
      val zy = floor(col("value") * 100).cast("long") % 1024
      Tables.events(s, d)
        .select(col("event_id"), zx.as("zx"), zy.as("zy"),
          ZOrder.zkey(Seq(zx, zy), bits = 10).as("zkey"))
        .orderBy("event_id")
    }),

    // MERGE INTO semantics (operators/SnapshotMerge): fold inserts,
    // updates, and delete tombstones into a base snapshot, latest
    // version wins per key — dataset versioning for a continuously
    // -ingesting pipeline, in one key-shuffle window pass. The change
    // sets are carved deterministically out of `orders` so both
    // engines fold the identical batch.
    "q34_snapshot_merge" -> ((s, d) => {
      import graft.operators.SnapshotMerge
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        asInt(col("o_totalprice"), 2).as("price_c"))
      val base = o.filter(col("o_orderkey") % 3 =!= 0).withColumn("ver", lit(0L))
      val inserts = o.filter(col("o_orderkey") % 3 === 0)
        .withColumn("ver", lit(1L)).withColumn("op", lit("u"))
      val updates = o.filter(col("o_orderkey") % 7 === 0)
        .withColumn("price_c", col("price_c") + 100000L)
        .withColumn("ver", lit(2L)).withColumn("op", lit("u"))
      val deletes = o.filter(col("o_orderkey") % 10 === 0)
        .withColumn("ver", lit(3L)).withColumn("op", lit("d"))
      SnapshotMerge(base, inserts.unionByName(updates).unionByName(deletes),
          Seq("o_orderkey"), "ver", "op")
        .orderBy("o_orderkey")
    }),

    // Skew-safe salted join (operators/SaltedJoin, the join companion
    // of q25's SaltedAgg): left rows salted across 4 sub-keys, right
    // side replicated 4x, result identical to the plain join — the
    // oracle IS the plain join, so the equivalence is hash-gated, and
    // SaltedJoinSpec asserts it frame-to-frame.
    "q35_salted_join" -> ((s, d) => {
      import graft.operators.SaltedJoin
      val l = Tables.lineitem(s, d).select(col("l_orderkey").as("o_orderkey"),
        asInt(col("l_extendedprice"), 2).as("price_c"))
      val r = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      SaltedJoin.inner(l, r, Seq("o_orderkey"), salts = 4)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_items"), sum("price_c").as("sum_price_c"))
        .orderBy("o_custkey")
    }),

    "q29_asof_forward" -> ((s, d) => {
      val r = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").cast("timestamp").cast("long").as("ord_sec"))
        .agg(max("o_orderkey").as("o_orderkey"))
      val l = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), Tables.tsSec.as("evt_sec"))
      AsOfJoin.forward(l, r, Seq("user_id"), "evt_sec", "ord_sec")
        .orderBy("event_id")
    }),

    // NEAREST as-of with a tolerance window (merge_asof
    // direction='nearest', tolerance=30 days): the closer of the
    // backward/forward matches, ties backward, matches beyond the
    // window nulled. Both carries ride ONE exchange + ONE sort
    // (AsOfJoinSpec pins the plan).
    "q30_asof_nearest" -> ((s, d) => {
      val r = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").cast("timestamp").cast("long").as("ord_sec"))
        .agg(max("o_orderkey").as("o_orderkey"))
      val l = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), Tables.tsSec.as("evt_sec"))
      AsOfJoin.nearest(l, r, Seq("user_id"), "evt_sec", "ord_sec",
          tolerance = Some(2592000L))
        .orderBy("event_id")
    }),

    // Gap-fill / resample: per key, materialize the FULL day series
    // between its first and last event and fill silent days with 0 —
    // the batch analogue of the detector's silent-window semantics
    // (a time series consumer needs explicit zeros, not missing rows).
    // sequence+explode generates keys x days rows (bounded by the span,
    // not the data); the left join back to actuals is one shuffle on
    // (key, day).
    "q28_gap_fill" -> ((s, d) => {
      val days = Tables.events(s, d)
        .select(col("event_type"), floor(Tables.tsSec / 86400L).cast("long").as("day"))
      val actual = days.groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      val full = actual.groupBy("event_type")
        .agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("day"))
      full.join(actual, Seq("event_type", "day"), "left")
        .na.fill(0L, Seq("n"))
        .orderBy("event_type", "day")
    }),

    // Approximate quantiles (the other classic mergeable sketch next
    // to q18's HLL): percentile_approx's quantile summary is computed
    // per partition and merged map-side — one tiny shuffle and NO
    // per-group sort, vs q22's exact windowed ranks; at scale the
    // sketch is the only affordable option. No DuckDB oracle (sketch
    // internals are engine-specific) → rows-only check, accuracy
    // bound asserted in SketchSpec.
    "q27_approx_quantiles" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select((col("l_orderkey") % 3).as("grp"), asInt(col("l_quantity"), 0).as("qty"))
        .groupBy("grp")
        .agg(
          percentile_approx(col("qty"), lit(0.5), lit(1000)).as("approx_median"),
          expr("CAST(percentile(qty, 0.5) AS BIGINT)").as("exact_median_floor"))
        .orderBy("grp")
    }),

    // q27's sketch-median error bound made DRIVER-CHECKABLE (VERDICT
    // r7 ask #5): percentile_approx(accuracy=1000) guarantees the
    // returned element's RANK is within n/1000 of the target rank
    // n/2. The value itself has no cross-engine oracle (summary
    // internals differ), but the rank guarantee is a deterministic
    // predicate on the same data: with n_lt = |qty < am| and
    // n_le = |qty <= am|, the returned element occupies ranks
    // [n_lt+1, n_le], and that range intersects
    // [n/2 - n/1000, n/2 + n/1000] iff 2000*n_le >= 998*n and
    // 2000*(n_lt+1) <= 1002*n + 2000 (one rank of slack for the
    // guarantee's ceil). Integer arithmetic end to end; the oracle
    // asserts the bound HOLDS per group, so a summary regression
    // breaks the hash instead of hiding behind a rows-only check.
    "q27b_approx_quantiles_bound" -> ((s, d) => {
      val base = Tables.lineitem(s, d)
        .select((col("l_orderkey") % 3).as("grp"), asInt(col("l_quantity"), 0).as("qty"))
      val apx = base.groupBy("grp")
        .agg(percentile_approx(col("qty"), lit(0.5), lit(1000)).as("am"))
      base.join(broadcast(apx), "grp")
        .groupBy("grp")
        .agg(
          sum(when(col("qty") < col("am"), 1L).otherwise(0L)).as("n_lt"),
          sum(when(col("qty") <= col("am"), 1L).otherwise(0L)).as("n_le"),
          count(lit(1)).as("n"))
        .select(col("grp"),
          ((col("n_le") * lit(2000L) >= col("n") * lit(998L)) &&
            ((col("n_lt") + lit(1L)) * lit(2000L) <= col("n") * lit(1002L) + lit(2000L)))
            .cast("long").as("within_bound"))
        .orderBy("grp")
    }),

    // Count-min-sketch heavy hitters — the third mergeable sketch next
    // to q18's HLL and q27's quantile summary: one agg pass builds the
    // CMS (per-partition sketches merge by counter addition, so the
    // estimate is order-independent and deterministic for a fixed
    // seed), then the top-5 exact counts ride next to their sketch
    // estimates. The exact side exists only as the comparison column;
    // at 100 TB the sketch pass is the affordable one. NO DuckDB
    // oracle (sketch internals are engine-specific) → rows-only check,
    // accuracy bound asserted in SketchSpec.
    "q33_heavy_hitters" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(graft.llm.TextFunctions.tokens(col("text"))).as("token"))
      val cms = toks.stat.countMinSketch("token",
        eps = 0.001, confidence = 0.99, seed = 42)
      val top = toks.groupBy("token").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("token")).limit(5)
        .collect().toSeq
      import s.implicits._
      top.zipWithIndex.map { case (r, i) =>
        (r.getString(0), r.getLong(1), cms.estimateCount(r.getString(0)), (i + 1).toLong)
      }.toDF("token", "exact_cnt", "cms_est", "rnk")
    }),

    // q33's CMS guarantee made DRIVER-CHECKABLE (VERDICT r7 ask #5):
    // count-min never under-counts, and over-counts by at most eps*N
    // (eps = 0.001, N = total tokens) with the configured 0.99
    // confidence — and for a FIXED seed the sketch is deterministic,
    // so on this corpus the bound is a concrete predicate. The oracle
    // recomputes the exact top-5 (same desc-count, token-asc
    // tiebreak) and asserts the bound held for each; an estimate
    // drifting outside eps*N breaks the hash.
    "q33b_heavy_hitters_bound" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(graft.llm.TextFunctions.tokens(col("text"))).as("token"))
      val nTotal = toks.count()
      val cms = toks.stat.countMinSketch("token",
        eps = 0.001, confidence = 0.99, seed = 42)
      val top = toks.groupBy("token").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("token")).limit(5)
        .collect().toSeq
      import s.implicits._
      top.zipWithIndex.map { case (r, i) =>
        val exact = r.getLong(1)
        val est = cms.estimateCount(r.getString(0))
        val ok = est >= exact && est <= exact + math.ceil(0.001 * nTotal).toLong
        (r.getString(0), (i + 1).toLong, if (ok) 1L else 0L)
      }.toDF("token", "rnk", "within_bound")
    }),

    // Exact distributed quantiles (percentile_disc semantics): window
    // rank + conditional agg picks the exact q1/median/q3 elements —
    // integer arithmetic end to end, no interpolation floats. One
    // shuffle on the group key; per-group local sort.
    "q22_quantiles" -> ((s, d) => {
      val w = Window.partitionBy("event_type").orderBy("value_c", "event_id")
      Tables.events(s, d)
        .select(col("event_type"), col("event_id"), asInt(col("value"), 2).as("value_c"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        .groupBy("event_type")
        .agg(
          max(when(col("rn") === ceil(col("n") / 4.0), col("value_c"))).as("q1_c"),
          max(when(col("rn") === ceil(col("n") / 2.0), col("value_c"))).as("median_c"),
          max(when(col("rn") === ceil(col("n") * 3.0 / 4.0), col("value_c"))).as("q3_c"),
          max("n").as("n"))
        .orderBy("event_type")
    }),

    // §2.2 reshaping — UNPIVOT/melt (wide → long), the inverse of
    // q17's pivot. Dataset.unpivot is a narrow projection (an Expand
    // node — no shuffle, no join): each input row emits one row per
    // value column, exactly how a metrics-wide fact table feeds a
    // long-format store at scale. The %5 filter sits BEFORE the
    // Expand so the scan prunes first.
    "q36_unpivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          asInt(col("l_quantity"), 0).as("qty"),
          asInt(col("l_extendedprice"), 2).as("price_c"),
          asInt(col("l_discount"), 2).as("disc_c"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("qty"), col("price_c"), col("disc_c")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric")
    }),

    // §2.2 windows — the ranking family q04 doesn't cover: rank /
    // dense_rank (real ties: the window orders by date only),
    // percent_rank / cume_dist (doubles, but exact small-integer
    // ratios — identical IEEE in both engines — scaled ×1e6 to
    // longs), ntile + lead over the fully tie-broken order. One
    // shuffle on o_custkey serves both window specs (same partition
    // key, compatible sort).
    "q37_window_ranks" -> ((s, d) => {
      val w1 = Window.partitionBy("o_custkey").orderBy("ord_sec")
      val w2 = Window.partitionBy("o_custkey").orderBy("ord_sec", "o_orderkey")
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("timestamp").cast("long").as("ord_sec"),
          asInt(col("o_totalprice"), 2).as("price_c"))
        .withColumn("rnk", rank().over(w1).cast("long"))
        .withColumn("drnk", dense_rank().over(w1).cast("long"))
        .withColumn("prank_e6", round(percent_rank().over(w1) * 1000000).cast("long"))
        .withColumn("cdist_e6", round(cume_dist().over(w1) * 1000000).cast("long"))
        .withColumn("quartile", ntile(4).over(w2).cast("long"))
        .withColumn("next_key", lead("o_orderkey", 1).over(w2))
        .orderBy("o_custkey", "ord_sec", "o_orderkey")
    }),

    // §2.2 SQL surface — the spark.sql entry point over temp views:
    // TPC-H-Q5-shaped 5-table join + a SCALAR SUBQUERY in the filter
    // (above-average orders). Catalyst plans it exactly like the
    // DataFrame API (region/nation broadcast; the subquery becomes a
    // one-row broadcast evaluated once, not per-row). The average is
    // integer cents DIV count so the threshold is exact in both
    // engines — a double AVG would make boundary rows hash-unstable.
    "q38_sql_api" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("v_customer")
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
      Tables.nation(s, d).createOrReplaceTempView("v_nation")
      Tables.region(s, d).createOrReplaceTempView("v_region")
      s.sql("""
        SELECT n.n_name,
               SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS revenue_e4,
               COUNT(*) AS n_items
        FROM v_customer c
        JOIN v_orders o   ON c.c_custkey = o.o_custkey
        JOIN v_lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN v_nation n   ON c.c_nationkey = n.n_nationkey
        JOIN v_region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND CAST(ROUND(o.o_totalprice * 100) AS BIGINT) >
              (SELECT SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) DIV COUNT(*)
               FROM v_orders)
        GROUP BY n.n_name
        ORDER BY revenue_e4 DESC, n_name
      """)
    }),

    // §2.2 windows — RANGE frame (q04/q37 are ROWS/rank frames): a
    // trailing 90-DAY revenue window keyed on the order timestamp,
    // the moving-aggregate shape time-series dashboards run. A range
    // frame includes every peer row at the same ordering value, so
    // ties contribute symmetrically and the result is deterministic
    // without a unique-key tiebreak in the frame itself.
    "q39_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("ord_sec"))
        .rangeBetween(-90L * 86400L, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("timestamp").cast("long").as("ord_sec"),
          asInt(col("o_totalprice"), 2).as("price_c"))
        .withColumn("sum90d_c", sum("price_c").over(w))
        .withColumn("n90d", count(lit(1)).over(w))
        .orderBy("o_custkey", "ord_sec", "o_orderkey")
    }),

    // §2.2 pipeline hygiene — the declarative data-quality gate
    // (QualityGate.audit): five expectations over lineitem compile
    // into ONE conditional-sum aggregate (one scan, one single-row
    // reduce, rules melted to rows by unpivot). NULL counts as a
    // violation — the three-valued-logic trap WHERE-based checks
    // silently pass.
    "q40_quality_gate" -> ((s, d) => {
      import graft.operators.QualityGate.{audit, Rule}
      audit(Tables.lineitem(s, d), Seq(
        Rule("disc_range", col("l_discount").between(0.0, 0.05)),
        Rule("flag_domain", col("l_returnflag").isin("A", "N", "R")),
        Rule("line_range", col("l_linenumber").between(1, 7)),
        Rule("price_positive", col("l_extendedprice") > 0.0),
        Rule("qty_range", col("l_quantity").between(1.0, 30.0))))
    }),

    // §2.2 graph pattern — distributed TRIANGLE COUNTING over the
    // part-co-occurrence graph (parts sharing an order). The classic
    // a<b<c edge orientation makes every triangle match exactly one
    // join pattern (no 6x overcount, no same-edge reuse), and turns
    // the two self-joins into equi-joins whose fan-out is bounded by
    // out-degree under the ordering — the standard distributed-
    // triangle trick (at web scale you orient by DEGREE then id,
    // which provably caps fan-out at O(sqrt(|E|)); id-orientation is
    // the same plan with a weaker bound). x20's connected components
    // covers the iterative-graph shape; this is the one-shot
    // pattern-match shape.
    "q41_triangles" -> ((s, d) => {
      val edges = coOccurrenceEdges(s, d)._2
        .localCheckpoint(true) // three consumers — materialize once
      val tri = edges.as("e1")
        .join(edges.as("e2"), col("e1.b") === col("e2.a"))
        .join(edges.as("e3"),
          col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      tri.agg(count(lit(1)).as("n_triangles"))
        .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
    }),

    // §2.2 set ops — schema-evolving union: unionByName with
    // allowMissingColumns aligns by NAME (q08's positional union is
    // the other semantics) and null-fills columns one epoch lacks —
    // how heterogeneous snapshots append at scale without positional
    // bugs. Aggregated so the oracle pins both the alignment and the
    // null-fill.
    "q42_union_by_name" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val y96 = o.filter(year(col("o_orderdate")) === 1996)
        .select(col("o_orderkey"), col("o_custkey"),
          asInt(col("o_totalprice"), 2).as("price_c"))
      val y97 = o.filter(year(col("o_orderdate")) === 1997)
        .select(col("o_custkey"), col("o_orderkey")) // reordered, price_c absent
      y96.unionByName(y97, allowMissingColumns = true)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(coalesce(col("price_c"), lit(0L))).as("sum_price_c"))
        .orderBy("o_custkey")
    }),

    // §2.2 windows — ratio-to-report (percent-of-total): each
    // nation's share of its region's revenue, as an exact integer
    // ratio (part*1e6 DIV whole — no float division to disagree on).
    // The share window re-shuffles on r_name (the aggregate's
    // (r_name, n_name) partitioning doesn't satisfy it) — but it
    // shuffles the POST-aggregate frame, |nations| rows, which is the
    // point: compute shares after reduction, never over raw facts.
    "q43_ratio_to_report" -> ((s, d) => {
      val rev = Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(asInt(col("o_totalprice"), 2)).as("rev_c"))
      val w = Window.partitionBy("r_name")
      rev
        .withColumn("region_rev_c", sum("rev_c").over(w))
        .withColumn("share_e6", expr("(rev_c * 1000000) DIV region_rev_c"))
        .orderBy("r_name", "n_name")
    }),

    // Iterative graph analytics beyond connected components: 3 rounds
    // of integer-arithmetic PageRank over the symmetrized q41
    // co-occurrence graph. The oracle runs the identical unrolled
    // rounds — possible ONLY because every division is integer
    // (PageRank.pageRankE9's determinism contract).
    "q44_pagerank" -> ((s, d) => {
      val und = coOccurrenceEdges(s, d)._2
      val edges = und.union(und.select(col("b"), col("a")))
      graft.operators.PageRank.pageRankE9(edges, "a", "b", iters = 3)
        .orderBy("node")
    }),

    // Multi-source BFS hop distance over the same graph: min-over-
    // paths distances are a lattice (rounds are idempotent), so the
    // iterative frontier expansion matches a bounded recursive-CTE
    // closure exactly — no floats, no tie ambiguity.
    "q45_bfs_hops" -> ((s, d) => {
      val (pairs, und) = coOccurrenceEdges(s, d)
      val edges = und.union(und.select(col("b"), col("a")))
      val seeds = pairs.select("l_partkey").distinct()
        .filter(col("l_partkey") % 509 === 0)
      graft.operators.BfsHops.hopsFrom(edges, "a", "b", seeds, "l_partkey",
          maxHops = 3)
        .orderBy("node")
    }),

    // Consecutive-duplicate collapse (the CDC / sensor change-log
    // pattern): keep only rows whose event_type differs from the same
    // user's previous row in (time, id) order — state-change
    // extraction as ONE lag window, where the naive form is a
    // self-join on row adjacency. The window shuffles once on
    // user_id; the filter is stateless after it.
    "q46_collapse_consecutive" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("evt_sec", "event_id")
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), Tables.tsSec.as("evt_sec"),
          col("event_type"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .select("event_id", "user_id", "evt_sec", "event_type")
        .orderBy("event_id")
    }),

    // Interval-overlap join with NO equi key (point-in-window
    // membership against a set of time windows): the scale-correct
    // form buckets time into fixed 900 s cells, explodes each window
    // over the cells it covers, and equi-joins on the cell — a probe
    // lives in exactly one cell, so each qualifying (event, window)
    // pair surfaces at most once and the residual range predicate
    // just confirms it. The naive form is a nested-loop theta join
    // (BroadcastNestedLoopJoin) that scans every event per window;
    // this plan is a plain shuffled equi-join whose fan-out is
    // len/900+1 cells per window, independent of corpus size.
    "q47_interval_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), Tables.tsSec.as("evt_sec"))
      val win = ev.filter(col("event_id") % 2000 === 0)
        .select(col("event_id").as("win_id"), col("evt_sec").as("w0"),
          (col("evt_sec") + 3600L).as("w1"))
      val winCells = win.select(col("win_id"), col("w0"), col("w1"),
        explode(sequence(expr("w0 DIV 900"), expr("(w1 - 1) DIV 900"))).as("cell"))
      ev.withColumn("cell", expr("evt_sec DIV 900"))
        .join(winCells, Seq("cell"))
        .filter(col("evt_sec") >= col("w0") && col("evt_sec") < col("w1"))
        .groupBy("win_id")
        .agg(count(lit(1)).as("n_events"), countDistinct("user_id").as("n_users"))
        .orderBy("win_id")
    }),

    // HOPPING (sliding) windows in batch — the built-in window()
    // generator with slide < width: every event lands in exactly
    // width/slide = 4 windows, so the plan is a bounded 4× explode
    // followed by one hash aggregate on the window start. The same
    // operator st02 exercises on the streaming engine, here in its
    // batch form (epoch-aligned starts, so the DuckDB mirror is pure
    // integer arithmetic on floor(sec/slide)).
    "q48_hopping_window" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), timestamp_seconds(Tables.tsSec).as("ts"))
      ev.groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct("user_id").as("n_users"))
        .select(unix_timestamp(col("window.start")).as("ws"),
          col("n_events"), col("n_users"))
        .orderBy("ws")
    }),

    // SKYLINE (Pareto front: minimize price, maximize size) without
    // the O(n²) dominance self-join. After collapsing to one row per
    // price (equal price ⇒ larger size dominates), a point survives
    // iff its size exceeds the max size over ALL strictly-cheaper
    // points. That prefix-max splits into two parallel stages:
    // (1) range-bucket the price axis — bucket id is monotonic in
    // price, so a PARTITIONED window per bucket (parallel, no global
    // sort) gives the within-bucket prefix; (2) the cross-bucket
    // carry is a prefix-max over the B per-bucket maxima — B rows,
    // the only single-partition window, broadcast back. At 100 TB
    // the dominance join is the thing that cannot run; this is two
    // shuffles + one tiny window.
    "q49_skyline" -> ((s, d) => {
      // one scan+shuffle of the fact table; bounds/bucketing/carry all
      // derive from the materialized per-price frame (|distinct price|
      // rows), not from three re-scans of part
      val pts = Tables.part(s, d)
        .groupBy(round(col("p_retailprice") * 100).cast("long").as("price_c"))
        .agg(max(col("p_size").cast("long")).as("sz"))
        .localCheckpoint(true)
      val bounds = pts.agg(min("price_c").as("lo"), max("price_c").as("hi"))
      val nBuckets = 32
      val bucketed = pts.crossJoin(broadcast(bounds))
        .withColumn("bkt", least(lit(nBuckets - 1L),
          (col("price_c") - col("lo")) * nBuckets / (col("hi") - col("lo") + 1)))
        .select("bkt", "price_c", "sz")
      val wIn = Window.partitionBy("bkt").orderBy("price_c")
        .rowsBetween(Window.unboundedPreceding, -1)
      val carryW = Window.orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val carry = bucketed.groupBy("bkt").agg(max("sz").as("bmax"))
        .withColumn("carry", max("bmax").over(carryW))
        .select("bkt", "carry")
      bucketed.withColumn("pmax_in", max("sz").over(wIn))
        .join(broadcast(carry), Seq("bkt"))
        .filter(col("sz") > greatest(
          coalesce(col("pmax_in"), lit(Long.MinValue)),
          coalesce(col("carry"), lit(Long.MinValue))))
        .select(col("price_c"), col("sz"))
        .orderBy("price_c")
    }),

    // SCD2 dimension build (the lakehouse change-history table):
    // collapse each customer's order-status stream to its CHANGE rows
    // (status differs from the previous row), then stamp validity
    // intervals — valid_to = next change's date, NULL marks the
    // current row. Both window passes share the (custkey) partitioning
    // and (date, orderkey) sort, so Catalyst plans ONE shuffle + one
    // sort and fuses the lag and lead into consecutive Window nodes
    // over the same distribution — the whole history build is a
    // single pass per key at any scale.
    "q50_scd2_build" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_orderstatus"))
        .withColumn("prev_status", lag("o_orderstatus", 1).over(w))
        .filter(col("prev_status").isNull ||
          col("prev_status") =!= col("o_orderstatus"))
        .withColumn("valid_to", lead("o_orderdate", 1).over(w))
        .select(col("o_custkey"), col("o_orderstatus").as("status"),
          col("o_orderdate").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.cast("int").as("is_current"))
        .orderBy("o_custkey", "valid_from", "status")
    }),

    // Ordered-sequence FUNNEL (view -> click -> purchase): step N's
    // entry time is the user's earliest step-N event STRICTLY AFTER
    // their step-(N-1) entry. Each step is a filtered aggregate
    // joined to the previous step's per-user frame — all three
    // aggregates and both joins hash on user_id, so after the first
    // exchange the whole chain is co-partitioned (no re-shuffle), and
    // each stage's frame only shrinks. The alternative — per-user
    // event sort + sequential scan — is a wider shuffle carrying
    // every event; this carries one timestamp per surviving user.
    "q51_funnel" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), Tables.tsSec.as("sec"))
      // each stage is materialized once: t1 feeds BOTH its own count
      // and t2 (and so on) — without the checkpoint the count union
      // re-derives t1 three times, re-scanning events six times
      def step(prev: DataFrame, prevT: String, typ: String, out: String) =
        e.filter(col("event_type") === typ)
          .join(prev, "user_id")
          .filter(col("sec") > col(prevT))
          .groupBy("user_id").agg(min("sec").as(out))
          .localCheckpoint(true)
      val t1 = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("sec").as("t1"))
        .localCheckpoint(true)
      val t2 = step(t1, "t1", "click", "t2")
      val t3 = step(t2, "t2", "purchase", "t3")
      t1.agg(count(lit(1)).as("n_users")).select(lit("1_view").as("step"), col("n_users"))
        .unionAll(t2.agg(count(lit(1)).as("n_users"))
          .select(lit("2_click").as("step"), col("n_users")))
        .unionAll(t3.agg(count(lit(1)).as("n_users"))
          .select(lit("3_purchase").as("step"), col("n_users")))
        .orderBy("step")
    }),

    // COHORT RETENTION: users grouped by first-active week, counted
    // per week-offset. The (user, week) distinct pass cuts the event
    // stream to at most |users| x |weeks| rows BEFORE the self-join,
    // the cohort frame is one row per user, and the join + final
    // aggregate both hash on user_id/cohort keys — two shuffles
    // total, each over the compacted frame, never over raw events.
    "q52_cohort_retention" -> ((s, d) => {
      val uw = Tables.events(s, d)
        .select(col("user_id"), Tables.tsSec.as("sec"))
        .select(col("user_id"), expr("sec div 604800").as("week"))
        .distinct()
      val cohort = uw.groupBy("user_id").agg(min("week").as("cohort_w"))
      uw.join(cohort, "user_id")
        .groupBy(col("cohort_w"), (col("week") - col("cohort_w")).as("offset_w"))
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_w", "offset_w")
    }),

    // The NATIVE forward as-of join (q29's composed plan, lowered to
    // the custom streaming-merge exec): the un-consumed lookahead row
    // of the single merge pass IS the forward match, so forward costs
    // exactly what backward does — two exchanges, two sorts, O(1)
    // merge state, and either side's bucketed layout elides its
    // exchange+sort. Same DuckDB oracle as q29.
    "q53_asof_native_forward" -> ((s, d) => {
      val r = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").cast("timestamp").cast("long").as("ord_sec"))
        .agg(max("o_orderkey").as("o_orderkey"))
      val l = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), Tables.tsSec.as("evt_sec"))
      AsOfJoin.forwardNative(l, r, Seq("user_id"), "evt_sec", "ord_sec")
        .orderBy("event_id")
    }),

    // NATIVE nearest-with-tolerance (q30's semantics): both
    // directional candidates fall out of the one merge pass — the
    // last consumed row (backward) and the lookahead (forward) —
    // closer wins, ties backward, beyond-tolerance matches nulled.
    "q54_asof_native_nearest" -> ((s, d) => {
      val r = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").cast("timestamp").cast("long").as("ord_sec"))
        .agg(max("o_orderkey").as("o_orderkey"))
      val l = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), Tables.tsSec.as("evt_sec"))
      AsOfJoin.nearestNative(l, r, Seq("user_id"), "evt_sec", "ord_sec",
          tolerance = Some(2592000L))
        .orderBy("event_id")
    }),

    // PARTITIONED SKETCH ROLLUP — the incremental-aggregate lifecycle
    // a 100 TB warehouse actually runs: per-month HLL sketches over
    // orders' customers are built ONCE, persisted as BINARY parquet
    // (KB per partition), and the corpus-wide distinct estimate is
    // produced by hll_union_agg over the STORED sketches — the base
    // table is never rescanned for the rollup (here it is re-read
    // only to compute the exact side the bound check needs). This is
    // what approx_count_distinct (q18) cannot do: its sketch dies
    // with the query, so every new grain pays a full scan; a stored
    // mergeable sketch turns year-over-month-over-day rollups into
    // sketch-sized reads. Driver-checked with the q18b pattern: the
    // estimate has no cross-engine oracle, but |est−exact| ≤ 5%·exact
    // (lgK=12 ⇒ rsd ≈ 1.6%) is a deterministic predicate whose exact
    // side DuckDB computes — per month AND for the merged total
    // (month_sec = −1), so a broken merge breaks the hash.
    "q55_sketch_partial_merge" -> ((s, d) => {
      val ord = Tables.orders(s, d).select(
        date_trunc("month", col("o_orderdate")).cast("long").as("month_sec"),
        col("o_custkey"))
      val dir = graft.core.Scratch.dir("graft_sketch_rollup")
      ord.groupBy("month_sec")
        .agg(hll_sketch_agg(col("o_custkey"), 12).as("sk"),
          countDistinct("o_custkey").as("exact"))
        .write.mode("overwrite").parquet(dir)
      val partials = s.read.parquet(dir)
      def withinRsd(sk: Column, exact: Column): Column =
        (abs(hll_sketch_estimate(sk) - exact) * lit(100L) <= exact * lit(5L))
          .cast("long").as("within_rsd")
      val monthly = partials.select(col("month_sec"), col("exact"),
        withinRsd(col("sk"), col("exact")))
      val total = partials.agg(hll_union_agg(col("sk")).as("sk"))
        .crossJoin(broadcast(ord.agg(countDistinct("o_custkey").as("exact"))))
        .select(lit(-1L).as("month_sec"), col("exact"),
          withinRsd(col("sk"), col("exact")))
      monthly.union(total).orderBy("month_sec")
    }),

    // DDSKETCH QUANTILE ROLLUP — q55's lifecycle for the OTHER
    // sketch family a latency/price warehouse runs on: per-month
    // relative-error quantile sketches (log-buckets, γ=1.04 ⇒ α≈2%)
    // persisted as plain parquet and merged BY SUM into corpus-wide
    // p50/p95/p99 — day→month→year rollups read sketch-sized inputs,
    // never the corpus, and merged partials are bit-identical to a
    // single-pass sketch (DdSketchSpec pins that). The driver check
    // is stronger than q55's: the exact discrete quantile comes out
    // of the SAME cumulative walk fed the identity relation — pure
    // integer arithmetic both engines reproduce — so exact_c is
    // hash-checked cross-engine, with the sketch estimate folded to
    // a within-α predicate on top (q18b pattern).
    "q56_ddsketch_rollup" -> ((s, d) => {
      val Gamma = 1.04
      val QsE6 = Seq(500000L, 950000L, 990000L)
      val ev = Tables.events(s, d).select(
        col("event_type"),
        date_trunc("month", Tables.tsSec.cast("timestamp")).cast("long")
          .as("month_sec"),
        round(col("value") * 100).cast("long").as("value_c"))
      val dir = graft.core.Scratch.dir("graft_dd_rollup")
      DdSketch.sketch(ev, Seq("event_type", "month_sec"), "value_c", Gamma)
        .write.mode("overwrite").parquet(dir)
      val merged = DdSketch.merge(s.read.parquet(dir), Seq("event_type"))
      val est = DdSketch.quantiles(merged, Seq("event_type"), QsE6)
        .select(col("event_type"), col("qe6"), col("n"),
          DdSketch.bucketValue(col("bucket"), Gamma).as("est_c"))
      val exact = DdSketch.quantiles(
          ev.groupBy(col("event_type"), col("value_c").as("bucket"))
            .agg(count(lit(1)).as("cnt")),
          Seq("event_type"), QsE6)
        .select(col("event_type"), col("qe6"), col("bucket").as("exact_c"))
      est.join(exact, Seq("event_type", "qe6"))
        .select(col("event_type"), col("qe6"), col("n"), col("exact_c"),
          (abs(col("est_c") - col("exact_c")) <= col("exact_c") * lit(0.03))
            .cast("long").as("within_rel"))
        .orderBy("event_type", "qe6")
    }),

    // RUNTIME BLOOM-FILTER PRUNED JOIN — the selective-dim × fact
    // join run deliberately in the shuffle-join regime with Catalyst's
    // InjectRuntimeFilter enabled (operators/RuntimeFilters): a bloom
    // of the filtered dim keys reaches the fact side BEFORE its
    // exchange, so at 100 TB the fact shuffle carries ~the matching
    // fraction instead of the whole table. The aggregation runs
    // EAGERLY inside the conf scope (localCheckpoint) because the
    // scope restores session confs on exit — a lazily-executed plan
    // would compile after the scope closed, silently dropping the
    // bloom. RuntimeFilterSpec pins the injection into the physical
    // plan; this row pins that the pruned plan's ANSWER equals the
    // plain join oracle (bloom filters are semantically transparent).
    // NOTE (ADVICE r8): the PLANS_BASELINE entry for this query sees
    // only the POST-checkpoint plan (scans:0/exchanges:2 — the
    // localCheckpoint truncates lineage), so the shape gate cannot
    // detect a silently-dropped runtime filter here; the bloom's
    // presence in the pre-checkpoint physical plan is pinned by
    // RuntimeFilterSpec, which runs in every `sbt test`.
    // Threshold "0" lifts the 10GB fact-scan size gate so the rule
    // fires on test-scale data; production keeps the default gate.
    "q57_bloom_pruned_join" -> ((s, d) => {
      graft.operators.RuntimeFilters.withBloomPruning(s,
          applicationSideScanSizeThreshold = "0") {
        Tables.lineitem(s, d)
          .join(Tables.part(s, d).filter(col("p_size") === 1),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_items"),
            sum(round(col("l_extendedprice") * 100).cast("long"))
              .as("sum_price_c"))
          .localCheckpoint(true)
      }.orderBy("p_brand")
    }),

    // THETA/KMV SKETCH SET ALGEBRA — the summary family member HLL
    // (q18/q55/st19) cannot replace: per ship-year KMV sketches of
    // the distinct parts shipped (k=256 longs each, built with map-
    // side combine) answer the year×year overlap matrix — |A∩B|,
    // |A∪B|, |A\B| ("parts retained / churned between years") — from
    // sketch rows ALONE. At 100 TB the exact pairwise matrix is a
    // |keys|-scale shuffle per PAIR; here every pair costs an O(k)
    // array intersection on broadcast-joined KB rows. The exact sides
    // below are recomputed from the base table only for the driver
    // check (the q55 lifecycle note); flags use the q18b bound
    // pattern — sizes within a just-under-4σ rsd margin (rsd =
    // 1/√(k−2) ≈ 6.3%; 4σ = 25.2%, the flag uses 25%), set ops within
    // the same margin of the UNION (theta set-op error is
    // union-relative, functions/KmvSketchAggregator scaladoc).
    // Disjoint pairs survive the exact-side join (left join +
    // coalesce 0 — ADVICE r8), so a pair with zero exact overlap
    // still asserts its near-zero intersection estimate.
    "q58_theta_sketch_setops" -> ((s, d) => {
      import graft.functions.KmvSketch._
      val K = 256
      val kmv = udaf(new graft.functions.KmvSketchAggregator(K))
      val yk = Tables.lineitem(s, d).select(
        year(col("l_shipdate")).cast("long").as("y"), col("l_partkey"))
      val sk = yk.select(col("y"), hash63(col("l_partkey")).as("h"))
        .groupBy("y").agg(kmv(col("h")).as("sk"))
      val pairs = sk.select(col("y").as("year_a"), col("sk").as("ska"))
        .join(broadcast(sk.select(col("y").as("year_b"), col("sk").as("skb"))),
          col("year_a") < col("year_b"))
      val ykd = yk.distinct()
      val exSize = ykd.groupBy("y").agg(count(lit(1)).as("n"))
      val exInter = ykd.as("a")
        .join(ykd.as("b"),
          col("a.l_partkey") === col("b.l_partkey") && col("a.y") < col("b.y"))
        .groupBy(col("a.y").as("year_a"), col("b.y").as("year_b"))
        .agg(count(lit(1)).as("exact_inter"))
      val unionD = col("exact_union").cast("double")
      def withinUnion(est: Column, exact: Column): Column =
        (abs(est - exact.cast("double")) <= unionD * lit(0.25)).cast("long")
      pairs
        .join(broadcast(exSize.select(col("y").as("year_a"), col("n").as("exact_a"))), "year_a")
        .join(broadcast(exSize.select(col("y").as("year_b"), col("n").as("exact_b"))), "year_b")
        .join(broadcast(exInter), Seq("year_a", "year_b"), "left")
        .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
        .withColumn("exact_union", col("exact_a") + col("exact_b") - col("exact_inter"))
        .select(col("year_a"), col("year_b"),
          col("exact_a"), col("exact_b"), col("exact_inter"), col("exact_union"),
          withinPct(estimate(col("ska"), K), col("exact_a"), 25).as("within_a"),
          withinPct(estimate(col("skb"), K), col("exact_b"), 25).as("within_b"),
          withinUnion(intersectEstimate(col("ska"), col("skb"), K),
            col("exact_inter")).as("within_inter"),
          withinUnion(unionEstimate(col("ska"), col("skb"), K),
            col("exact_union")).as("within_union"),
          withinUnion(exceptEstimate(col("ska"), col("skb"), K),
            col("exact_a") - col("exact_inter")).as("within_diff"))
        .orderBy("year_a", "year_b")
    }),

    // PERSISTED THETA PARTIALS — q55's store-once/merge-forever
    // lifecycle for the KMV family, plus the capability that justifies
    // persisting THETA rather than HLL partials: stored sketches still
    // support INTERSECTION. Per-month customer sketches are written
    // once as array<bigint> parquet (2 KB each); the corpus-wide
    // distinct estimate comes from KmvMergeAggregator over the STORED
    // rows (month_sec = −1), and "customers active in BOTH halves of
    // the history" (month_sec = −2) — a question hll_union_agg can
    // never answer from partials — from the two merged half-sketches.
    // Monthly sets (~170 < k=256) are exhaustive ⇒ estimates exact;
    // the total (1500) and the halves engage the estimator. Exact
    // sides re-read the base table only for the driver check; flags
    // are the q18b/q58 4σ bound (25%).
    "q59_theta_partial_merge" -> ((s, d) => {
      import graft.functions.KmvSketch._
      val K = 256
      val kmv = udaf(new graft.functions.KmvSketchAggregator(K))
      val kmvMerge = udaf(new graft.functions.KmvMergeAggregator(K))
      // splitForCpu: the q60 rationale — the md5 key hash serialized
      // on the single-split local scan (A/B 1.85 → 1.40 s; measured
      // per-entry because the same split REGRESSED q55/q56/q67, whose
      // partial-agg buffer serialization outweighs the hash
      // parallelism — those stay single-split). KMV is a set function,
      // so values are unchanged.
      val ord = Tables.splitForCpu(s, Tables.orders(s, d), "o_custkey").select(
        date_trunc("month", col("o_orderdate")).cast("long").as("month_sec"),
        col("o_custkey"))
      val dir = graft.core.Scratch.dir("graft_theta_rollup")
      ord.select(col("month_sec"), hash63(col("o_custkey")).as("h"),
          col("o_custkey"))
        .groupBy("month_sec")
        .agg(kmv(col("h")).as("sk"), countDistinct("o_custkey").as("exact"))
        .write.mode("overwrite").parquet(dir)
      val partials = s.read.parquet(dir)
      val monthly = partials.select(col("month_sec"), col("exact"),
        withinPct(estimate(col("sk"), K), col("exact"), 25).as("within_rsd"))
      val total = partials.agg(kmvMerge(col("sk")).as("sk"))
        .crossJoin(broadcast(ord.agg(countDistinct("o_custkey").as("exact"))))
        .select(lit(-1L).as("month_sec"), col("exact"),
          withinPct(estimate(col("sk"), K), col("exact"), 25).as("within_rsd"))
      val Split = 883612800L // 1998-01-01T00:00:00Z
      val exBoth = ord
        .select((col("month_sec") >= Split).as("late"), col("o_custkey"))
        .distinct()
        .groupBy("o_custkey").agg(count(lit(1)).as("n_halves"))
        .filter(col("n_halves") === 2)
        .agg(count(lit(1)).as("exact"))
      val inter = partials
        .groupBy((col("month_sec") >= Split).as("late"))
        .agg(kmvMerge(col("sk")).as("sk"))
        .groupBy().pivot("late", Seq(false, true)).agg(first("sk"))
        .crossJoin(broadcast(exBoth))
        .select(lit(-2L).as("month_sec"), col("exact"),
          withinPct(intersectEstimate(col("false"), col("true"), K),
            col("exact"), 25).as("within_rsd"))
      monthly.union(total).union(inter).orderBy("month_sec")
    }),

    // COUNT-MIN JOIN-CARDINALITY ESTIMATE — the third mergeable sketch
    // family (after HLL/theta distincts and DDSketch quantiles): a CM
    // sketch is a d×w counter RELATION (groupBy (depth, hash%w) count
    // — counters ADD, so map-side combine and partition-wise merge
    // are the aggregation itself), and the inner product of two
    // sketches Σ_w a[d,w]·b[d,w], minimized over depths, estimates
    // |A ⋈ B| with a one-sided guarantee: collisions only ADD cross
    // terms, so est ≥ exact ALWAYS (Cormode–Muthukrishnan). That is
    // the shuffle-planning primitive at 100 TB — join size from two
    // 2 MB sketches (d=4, w=65536 fixed regardless of input) before
    // committing either table to an exchange. Everything here is
    // integer arithmetic on a deterministic hash (TF.hash60), so
    // unlike the probabilistic-bound families the ESTIMATE ITSELF is
    // hash-checked cross-engine: rows d=0..3 are the per-depth inner
    // products, d=−1 the min (the estimate), d=−2 the exact join
    // size computed once for the check.
    "q60_cm_join_estimate" -> ((s, d) => {
      import graft.operators.CmSketch
      // splitForCpu: the md5-prefix bucket hash is the entry's compute
      // (4 hashes per key), and the local single-split scans serialized
      // all of it on one core (the bench's 19-task plan); at cluster
      // scale the inputs arrive pre-split and this inserts nothing
      // (the Tables.splitForCpu contract). Counter sums are
      // order-insensitive, so the answer is bit-identical.
      val li = Tables.splitForCpu(s, Tables.lineitem(s, d), "l_orderkey")
      val or = Tables.splitForCpu(s, Tables.orders(s, d), "o_orderkey")
      val a = CmSketch.sketch(li, col("l_orderkey"), "cnt_a")
      val b = CmSketch.sketch(or, col("o_orderkey"), "cnt_b")
      val inner = CmSketch.innerProducts(a, b)
      val est = inner.agg(min("inner_e").as("inner_e"))
        .select(lit(-1L).as("d"), col("inner_e"))
      val exact = li
        .join(or, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("inner_e"))
        .select(lit(-2L).as("d"), col("inner_e"))
      inner.select(col("d"), col("inner_e")).union(est).union(exact)
        .orderBy("d")
    }),

    // THE SKETCH ALGEBRA FROM PURE SQL — q58's theta overlap matrix
    // re-expressed entirely as one spark.sql statement over the
    // extension-registered functions (functions/SketchSqlFunctions:
    // hash63 / kmv_sketch / kmv_estimate / kmv_intersect /
    // kmv_union_estimate / kmv_except), VERDICT r8 ask #4: a SQL-only
    // user (q38's audience, spark.sql.extensions on a cluster submit)
    // reaches the mergeable-summary capability without the Scala API.
    // The SQL functions delegate to the IDENTICAL Column
    // implementations (SketchSqlSpec pins surface equality), so the
    // plan — sketch-sized matrix on broadcast KB rows, exact sides
    // only for the driver check — is q58's. Same oracle shape and
    // bound flags as q58 (just-under-4σ = 25%).
    "q61_sql_sketch_algebra" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
      s.sql("""
        WITH yk AS (SELECT DISTINCT CAST(year(l_shipdate) AS BIGINT) AS y,
                           l_partkey AS k
                    FROM v_lineitem),
        sk AS (SELECT y, kmv_sketch(hash63(k), 256) AS sk FROM yk GROUP BY y),
        sz AS (SELECT y, CAST(count(*) AS BIGINT) AS n FROM yk GROUP BY y),
        iv AS (SELECT a.y AS ya, b.y AS yb, count(*) AS exact_inter
               FROM yk a JOIN yk b ON a.k = b.k AND a.y < b.y GROUP BY a.y, b.y)
        SELECT sa.y AS year_a, sb.y AS year_b, sa.n AS exact_a, sb.n AS exact_b,
               CAST(COALESCE(iv.exact_inter, 0) AS BIGINT) AS exact_inter,
               CAST(sa.n + sb.n - COALESCE(iv.exact_inter, 0) AS BIGINT) AS exact_union,
               CAST(abs(kmv_estimate(ka.sk, 256) - sa.n) * 100 <= sa.n * 25 AS BIGINT) AS within_a,
               CAST(abs(kmv_estimate(kb.sk, 256) - sb.n) * 100 <= sb.n * 25 AS BIGINT) AS within_b,
               CAST(abs(kmv_intersect(ka.sk, kb.sk, 256) - COALESCE(iv.exact_inter, 0))
                      <= (sa.n + sb.n - COALESCE(iv.exact_inter, 0)) * 0.25 AS BIGINT) AS within_inter,
               CAST(abs(kmv_union_estimate(ka.sk, kb.sk, 256)
                        - (sa.n + sb.n - COALESCE(iv.exact_inter, 0)))
                      <= (sa.n + sb.n - COALESCE(iv.exact_inter, 0)) * 0.25 AS BIGINT) AS within_union,
               CAST(abs(kmv_except(ka.sk, kb.sk, 256) - (sa.n - COALESCE(iv.exact_inter, 0)))
                      <= (sa.n + sb.n - COALESCE(iv.exact_inter, 0)) * 0.25 AS BIGINT) AS within_diff
        FROM sz sa JOIN sz sb ON sa.y < sb.y
        JOIN sk ka ON ka.y = sa.y
        JOIN sk kb ON kb.y = sb.y
        LEFT JOIN iv ON iv.ya = sa.y AND iv.yb = sb.y
        ORDER BY year_a, year_b
      """)
    }),

    // PARTITION-PRUNED SKETCH-INDEX PROBE (VERDICT r8 ask #5) — the
    // read path q59/st23's persisted partials were missing: the
    // per-month theta index is hive-partitioned BY MONTH
    // (operators/SketchIndex), so this 1996-only question scans
    // exactly the 12 in-range month directories — planning-time
    // partition pruning asserted in SketchIndexSpec; here the ANSWER
    // is oracle-gated. Per-month sets (< k) are exhaustive ⇒ exact;
    // the merged range row (month_sec = −1) engages the estimator
    // under the q58 just-under-4σ bound. Exact sides re-read the base
    // table only for the driver check — the production probe touches
    // index KBs alone.
    "q62_sketch_index_probe" -> ((s, d) => {
      import graft.functions.KmvSketch._
      import graft.operators.SketchIndex
      val K = 256
      val kmvMerge = udaf(new graft.functions.KmvMergeAggregator(K))
      val ord = Tables.orders(s, d).select(
        date_trunc("month", col("o_orderdate")).cast("long").as("month_sec"),
        col("o_custkey"))
      // since r13 the probe goes through CATALOG DISCOVERY (VERDICT
      // r12 ask #2): the derived frame lands as a scratch table (the
      // catalog sidecar needs a writable table dir), the index
      // registers as kind=sketch, and the probe states only the month
      // range — no index path. KMV sketches are order-free functions
      // of each month's key SET, so the round-trip through parquet
      // changes nothing.
      // fixture cached per (entry, sf): the INDEX BUILD (landing write +
      // writeMonthly + registration) is lifecycle fixture — the entry is
      // named for the PROBE, and rebuilding the index inside the timed
      // query overstated the read path ~5× (the q69–q74/q77 discipline,
      // VERDICT r10 ask #7 / ADVICE r14 #5; q67 remains the entry that
      // times the build lifecycle itself). First run still exercises the
      // full build; the layout is deterministic per sf dir.
      val root = graft.core.Scratch.cachedDir(s"q62_skidx_$d") { r =>
        ord.write.parquet(s"$r/ord")
        SketchIndex.writeMonthly(s.read.parquet(s"$r/ord"),
          "month_sec", "o_custkey", s"$r/sk", K)
        graft.sources.IndexAdvisor.register(s, s"$r/ord", "sketch", s"$r/sk",
          Seq("month_sec", "o_custkey"), Map("k" -> K.toString))
      }
      val ordPath = s"$root/ord"
      val From = 820454400L  // 1996-01-01T00:00:00Z
      val Until = 852076800L // 1997-01-01T00:00:00Z
      val probed = graft.sources.IndexAdvisor.sketchRangeDiscovered(
        s, ordPath, From, Until)
      val inRange = ord.filter(col("month_sec") >= From && col("month_sec") < Until)
      val monthly = probed
        .join(inRange.groupBy("month_sec")
          .agg(countDistinct("o_custkey").as("exact")), "month_sec")
        .select(col("month_sec"), col("exact"),
          withinPct(estimate(col("sk"), K), col("exact"), 25).as("within_rsd"))
      val total = probed.agg(kmvMerge(col("sk")).as("sk"))
        .crossJoin(broadcast(inRange.agg(countDistinct("o_custkey").as("exact"))))
        .select(lit(-1L).as("month_sec"), col("exact"),
          withinPct(estimate(col("sk"), K), col("exact"), 25).as("within_rsd"))
      monthly.union(total).orderBy("month_sec")
    }),

    // SHARDED-OUTPUT HOLISTIC AGGREGATE — the skew relief ScaleSmoke's
    // measurement shows two-stage salting CANNOT give collect_set (the
    // hot key's set IS the output, so any single-row plan funnels it
    // through one task): values route to shards BY VALUE
    // (SaltedAgg.collectSetSharded), each (key, shard) row holds a
    // disjoint exact slice, no cross-shard merge exists, and the hot
    // key costs `shards` parallel bounded tasks. Flattening a key's
    // shards equals array_sort(collect_set) (SaltingSpec); here the
    // per-shard rows themselves are the oracle-gated output (folded
    // to sorted joined strings — the driver gate compares scalars).
    "q63_sharded_collect_set" -> ((s, d) => {
      import graft.operators.SaltedAgg
      SaltedAgg.collectSetSharded(
          Tables.events(s, d).withColumn("uid_bucket", col("user_id") % 200),
          Seq("event_type"), "uid_bucket",
          shardExpr = pmod(col("uid_bucket"), lit(4)), out = "uniq")
        .withColumnRenamed("__shard", "shard")
        .withColumn("uniq", concat_ws(",", col("uniq")))
        .orderBy("event_type", "shard")
    }),

    // DDSKETCH FROM PURE SQL — q56's relative-error quantile path via
    // the extension-registered dd_bucket/dd_bucket_value scalars
    // (q61's pattern for the second sketch family): build the
    // log-bucket sketch relation, cumulative-walk it to p50/p95/p99,
    // and bound-check the midpoint estimator against the exact
    // discrete quantile from the SAME walk over the identity
    // relation — all in one spark.sql statement. The exact side
    // (exact_c) is integer arithmetic both engines reproduce, so it
    // is hash-checked cross-engine like q56.
    // DDSketch's log-bucket domain is STRICTLY POSITIVE values — a
    // non-positive value_c would make dd_bucket NULL (log of ≤ 0) and
    // flip within_rel to NULL against the oracle's hardcoded 1, so
    // the precondition is enforced with an explicit filter on BOTH
    // sides rather than relied on implicitly (ADVICE r9; today
    // events.value > 0 always, so the filter drops zero rows)
    "q64_sql_ddsketch" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("value_c"))
        .filter(col("value_c") > 0)
        .createOrReplaceTempView("v_ev_vals")
      s.sql("""
        WITH qs AS (SELECT explode(array(500000L, 950000L, 990000L)) AS qe6),
        sk AS (SELECT event_type, dd_bucket(value_c, 1.04D) AS bucket,
                      count(*) AS cnt
               FROM v_ev_vals GROUP BY 1, 2),
        cum AS (SELECT event_type, bucket, cnt,
                       sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
                       sum(cnt) OVER (PARTITION BY event_type) AS n
                FROM sk),
        est AS (SELECT event_type, qe6, max(n) AS n,
                       min(CASE WHEN cum >= (n * qe6 + 999999) DIV 1000000
                                THEN bucket END) AS bucket
                FROM cum CROSS JOIN qs GROUP BY event_type, qe6),
        xg AS (SELECT event_type, value_c AS bucket, count(*) AS cnt
               FROM v_ev_vals GROUP BY 1, 2),
        xcum AS (SELECT event_type, bucket, cnt,
                        sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
                        sum(cnt) OVER (PARTITION BY event_type) AS n
                 FROM xg),
        exact AS (SELECT event_type, qe6,
                         min(CASE WHEN cum >= (n * qe6 + 999999) DIV 1000000
                                  THEN bucket END) AS exact_c
                  FROM xcum CROSS JOIN qs GROUP BY event_type, qe6)
        SELECT est.event_type, est.qe6, est.n, exact.exact_c,
               CAST(abs(dd_bucket_value(est.bucket, 1.04D) - exact.exact_c)
                      <= exact.exact_c * 0.03 AS BIGINT) AS within_rel
        FROM est JOIN exact
          ON est.event_type = exact.event_type AND est.qe6 = exact.qe6
        ORDER BY event_type, qe6
      """)
    }),

    // SKEW-SAFE LEFT OUTER JOIN (SaltedJoin.left, r9) — the
    // enrichment shape q35's inner form can't cover: hot fact keys
    // left-joining a dimension that lacks some keys. Every left row
    // carries exactly one salt, so unmatched rows survive the
    // (key, salt) left join exactly once with nulls — result ≡ the
    // plain left join (SaltedJoinSpec pins it frame-to-frame; this
    // row hash-gates it through the aggregate, unmatched rows in the
    // o_custkey = −1 bucket).
    "q66_salted_left_join" -> ((s, d) => {
      import graft.operators.SaltedJoin
      val l = Tables.lineitem(s, d).select(col("l_orderkey").as("o_orderkey"),
        asInt(col("l_extendedprice"), 2).as("price_c"))
      val r = Tables.orders(s, d).filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), col("o_custkey"))
      SaltedJoin.left(l, r, Seq("o_orderkey"), salts = 4)
        .groupBy(coalesce(col("o_custkey"), lit(-1L)).as("o_custkey"))
        .agg(count(lit(1)).as("n_items"), sum("price_c").as("sum_price_c"))
        .orderBy("o_custkey")
    }),

    // SKETCH-INDEX LSM LIFECYCLE (VERDICT r9 ask #1, driver-proven) —
    // q62's probe over an index built the way a LIVE STREAM builds
    // it: two staged micro-batch appends (flat write-optimized files,
    // ~6× cheaper per batch than a hive append), a compact() fold
    // into the hive-partitioned read layout, then a THIRD staged
    // append landing after compaction — so the probe reads the
    // two-level hive ∪ staging union. KMV merge is associative,
    // commutative, and idempotent on sets, so however the rows were
    // split across levels the merged range answer equals q62's
    // one-shot build — which is exactly what the oracle asserts.
    // File-count and hash-invariance mechanics live in
    // SketchIndexSpec; this row puts the lifecycle's ANSWER under the
    // DuckDB gate.
    "q67_sketch_index_lifecycle" -> ((s, d) => {
      import graft.functions.KmvSketch._
      import graft.operators.SketchIndex
      val K = 256
      val kmvMerge = udaf(new graft.functions.KmvMergeAggregator(K))
      val ord = Tables.orders(s, d).select(
        date_trunc("month", col("o_orderdate")).cast("long").as("month_sec"),
        col("o_custkey"))
      val dir = graft.core.Scratch.dir("graft_sketch_index_lsm") + "/idx"
      Seq(0, 1).foreach { b =>
        SketchIndex.appendStaged(ord.filter(col("o_custkey") % 3 === b),
          "month_sec", "o_custkey", dir, K)
      }
      SketchIndex.compact(s, dir, K)
      SketchIndex.appendStaged(ord.filter(col("o_custkey") % 3 === 2),
        "month_sec", "o_custkey", dir, K)
      val From = 820454400L  // 1996-01-01T00:00:00Z
      val Until = 852076800L // 1997-01-01T00:00:00Z
      val probed = SketchIndex.probeRange(s, dir, From, Until)
        .groupBy("month_sec").agg(kmvMerge(col("sk")).as("sk"))
      val inRange = ord.filter(col("month_sec") >= From && col("month_sec") < Until)
      val monthly = probed
        .join(inRange.groupBy("month_sec")
          .agg(countDistinct("o_custkey").as("exact")), "month_sec")
        .select(col("month_sec"), col("exact"),
          withinPct(estimate(col("sk"), K), col("exact"), 25).as("within_rsd"))
      val total = probed.agg(kmvMerge(col("sk")).as("sk"))
        .crossJoin(broadcast(inRange.agg(countDistinct("o_custkey").as("exact"))))
        .select(lit(-1L).as("month_sec"), col("exact"),
          withinPct(estimate(col("sk"), K), col("exact"), 25).as("within_rsd"))
      monthly.union(total).orderBy("month_sec")
    }),

    // SKETCH-DRIVEN JOIN PLANNING — persisted Count-Min column stats
    // (operators/SketchStats) + the injected optimizer rule
    // (plans/SketchBroadcastRule): Spark's size-only stats see the
    // WHOLE FILE's size for a filtered scan, so a dimension that a
    // selective filter shrank to broadcast range still sort-merge-
    // joins — at 100 TB, a full fact-table exchange. The rule bounds
    // the post-filter cardinality with a CM point query (collisions
    // only ADD, so "small" evidence is safe) and writes a broadcast
    // hint into the Join node. Run with static auto-broadcast
    // DISABLED and executed eagerly inside the scope (q57's
    // localCheckpoint pattern — and with the same baseline caveat:
    // the shape gate sees the post-checkpoint plan, so the SMJ→BHJ
    // flip itself is pinned by SketchBroadcastSpec in every sbt
    // test), so the broadcast in this plan exists ONLY because the
    // sketch said so; the oracle asserts the hinted plan's ANSWER
    // equals the plain join. Stats registration is scoped
    // register→run→unregister so no other registry entry's hint
    // surface changes.
    "q68_sketch_broadcast_join" -> ((s, d) => {
      import graft.operators.SketchStats
      val ordersPath = s"$d/orders.parquet"
      // stats sidecar cached per (entry, sf): building the CM column
      // stats is the nightly-stats lifecycle, not the planning+join
      // this entry is named for (the q62/q77 discipline); the
      // register→run→unregister scoping below stays per-run — the
      // hint surface is still torn down after every execution
      val statsDir = graft.core.Scratch.cachedDir(s"q68_stats_$d") { r =>
        SketchStats.build(Tables.orders(s, d), col("o_orderpriority"),
          s"$r/orders_priority")
      } + "/orders_priority"
      SketchStats.register(s, statsDir, ordersPath, "o_orderpriority",
        avgRowBytes = 64)
      try {
        SketchStats.withStaticBroadcastOff(s) {
          Tables.lineitem(s, d)
            .join(Tables.orders(s, d)
                .filter(col("o_orderpriority") === "1-URGENT"),
              col("l_orderkey") === col("o_orderkey"))
            .groupBy("l_returnflag")
            .agg(count(lit(1)).as("n"),
              sum(asInt(col("l_quantity"), 0)).as("sum_qty"))
            .localCheckpoint(true)
        }.orderBy("l_returnflag")
      } finally SketchStats.unregister(ordersPath, "o_orderpriority")
    }),

    // FILE-LEVEL ZONE-MAP SKIPPING (operators/ZoneMap) — the third
    // member of the file-skipping trio: hive partition pruning skips
    // directories (q62), ZOrder clusters rows so per-file ranges are
    // tight (q32), and the zone map turns those ranges into files
    // never opened. Lifecycle under the oracle: z-order lineitem by
    // (l_partkey, l_suppkey) into a multi-file layout, build the
    // per-file min/max map in one scan, probe a 2-D box through
    // prunedFiles → multi-path read → exact predicate. Pruning must
    // be invisible in the ANSWER (the oracle runs the same box on
    // the ORIGINAL table — same rows, different layout); the
    // files-actually-skipped assertion lives in ZoneMapSpec.
    "q69_zonemap_pruned_scan" -> ((s, d) => {
      import graft.operators.{ZOrder, ZoneMap}
      import graft.operators.ZoneMap.Range
      // fixture built ONCE per (entry, sf) and reused: the entry is
      // named for its READ path, and rebuilding the z-ordered layout
      // inside every timed run overstated it ~5× (VERDICT r10 ask #7)
      val root = graft.core.Scratch.cachedDir(s"q69_zonemap_$d") { r =>
        ZOrder.writeZOrdered(
          Tables.lineitem(s, d).select("l_orderkey", "l_linenumber",
            "l_partkey", "l_suppkey", "l_returnflag", "l_quantity"),
          s"$r/li_z", Seq("l_partkey", "l_suppkey"), bits = 11, files = 16)
        ZoneMap.build(s, s"$r/li_z", Seq("l_partkey", "l_suppkey"), s"$r/li_zm")
      }
      val table = s"$root/li_z"
      val zm = s"$root/li_zm"
      val box = Seq(Range("l_partkey", 10, 400), Range("l_suppkey", 1, 40))
      ZoneMap.readPruned(s, table, zm, box)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(asInt(col("l_quantity"), 0)).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // ZONE-MAP SKIPPING AT PLANNING TIME — q69's statistics consulted
    // INSIDE the scan node (graft.sources.ZoneMapFileIndex): the table
    // mounts as one HadoopFsRelation whose FileIndex filters its own
    // file listing against the persisted map when FileSourceScanExec
    // hands it the scan's data filters — the Delta/Iceberg data-skipping
    // posture, vs q69's driver-side path list. The plan is a single
    // ordinary parquet scan with PushedFilters intact, so Catalyst/AQE
    // treat it like any relation; ZoneMapPlanningSpec pins the skipped
    // numFiles metric, pushdown, and answer equality.
    "q70_zonemap_planned_scan" -> ((s, d) => {
      import graft.operators.{ZOrder, ZoneMap}
      // fixture cached per (entry, sf) — see q69 (VERDICT r10 ask #7)
      val root = graft.core.Scratch.cachedDir(s"q70_zonemap_plan_$d") { r =>
        ZOrder.writeZOrdered(
          Tables.lineitem(s, d).select("l_orderkey", "l_linenumber",
            "l_partkey", "l_suppkey", "l_returnflag", "l_quantity"),
          s"$r/li_z", Seq("l_partkey", "l_suppkey"), bits = 11, files = 16)
        ZoneMap.build(s, s"$r/li_z", Seq("l_partkey", "l_suppkey"), s"$r/li_zm")
      }
      val table = s"$root/li_z"
      val zm = s"$root/li_zm"
      graft.sources.ZoneMapFileIndex
        .read(s, table, zm, Set("l_partkey", "l_suppkey"))
        .filter(col("l_partkey").between(50, 300) &&
          col("l_suppkey").between(2, 30))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(asInt(col("l_quantity"), 0)).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // COUNT-MIN FROM PURE SQL — q60's join-size estimator via the
    // extension-registered cm_bucket scalar: depth arrives as a
    // COLUMN (SQL explodes its own 0..3 range), the sketches are
    // plain GROUP BYs, the estimate is the min per-depth inner
    // product. Deterministic integer arithmetic end to end, so the
    // estimate itself is hash-checked by q60's oracle arithmetic.
    "q65_sql_cm_estimate" -> ((s, d) => {
      // splitForCpu'd views — the q60 rationale (the md5 bucket hash
      // serialized on the local single-split scan; no-op on pre-split
      // cluster input, counter sums order-insensitive)
      Tables.splitForCpu(s, Tables.lineitem(s, d), "l_orderkey")
        .createOrReplaceTempView("v_lineitem")
      Tables.splitForCpu(s, Tables.orders(s, d), "o_orderkey")
        .createOrReplaceTempView("v_orders")
      s.sql("""
        WITH a AS (SELECT b.d AS d, b.w AS w, count(*) AS cnt_a
              FROM (SELECT explode(cm_buckets(l_orderkey, 65536L)) AS b
                    FROM v_lineitem) GROUP BY 1, 2),
        b AS (SELECT b.d AS d, b.w AS w, count(*) AS cnt_b
              FROM (SELECT explode(cm_buckets(o_orderkey, 65536L)) AS b
                    FROM v_orders) GROUP BY 1, 2),
        i AS (SELECT a.d, sum(cnt_a * cnt_b) AS inner_e
              FROM a JOIN b ON a.d = b.d AND a.w = b.w GROUP BY 1)
        SELECT d, inner_e FROM i
        UNION ALL SELECT -1L, min(inner_e) FROM i
        UNION ALL SELECT -2L, count(*) FROM v_lineitem
                  JOIN v_orders ON l_orderkey = o_orderkey
        ORDER BY d
      """)
    }),

    // PER-FILE BLOOM INDEX PROBE (operators/FileBloom) — the fourth
    // file-skipping member and the one the zone map can't serve: a
    // point/IN probe on an UNCLUSTERED key, where every file's
    // [min,max] spans the whole domain and min/max stats prune
    // nothing. Lifecycle under the oracle: scatter documents across a
    // multi-file layout keyed by text hash (worst case for ranges),
    // build the per-file bloom on doc_id in one scan, probe an
    // IN-list through prunedFiles → multi-path read → exact
    // predicate. Pruning must be invisible in the ANSWER (the oracle
    // runs the same IN on the original table); the files-actually-
    // skipped and no-false-negative assertions live in FileBloomSpec.
    "q71_bloom_pruned_scan" -> ((s, d) => {
      import graft.operators.FileBloom
      // fixture cached per (entry, sf) — see q69 (VERDICT r10 ask #7)
      val root = graft.core.Scratch.cachedDir(s"q71_bloom_$d") { r =>
        Tables.documents(s, d)
          .repartition(16, col("text"))
          .write.mode("overwrite").parquet(s"$r/docs")
        FileBloom.build(s, s"$r/docs", "doc_id", s"$r/docs_bloom",
          m = 8192, k = 4)
      }
      val (table, bm) = (s"$root/docs", s"$root/docs_bloom")
      FileBloom.readPruned(s, table, bm, "doc_id",
          Seq(lit(7L), lit(233L), lit(481L))) // doc_id is int64: key literals must carry the column's own type
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // BLOOM SKIPPING AT PLANNING TIME — q71's filters consulted
    // INSIDE the scan node (graft.sources.BloomFileIndex): the table
    // mounts as one HadoopFsRelation whose FileIndex tests the scan's
    // own equality/IN data filters against the per-file blooms and
    // drops files that provably hold no probed key — the point-probe
    // twin of q70's zone-map planning path, PushedFilters intact,
    // skip visible in the scan's numFiles metric (BloomPlanningSpec
    // pins skipping, pushdown, conservatism for late files, and
    // cast-narrowing of analyzer-widened literals).
    "q72_bloom_planned_scan" -> ((s, d) => {
      import graft.operators.FileBloom
      // fixture cached per (entry, sf) — see q69 (VERDICT r10 ask #7)
      val root = graft.core.Scratch.cachedDir(s"q72_bloom_plan_$d") { r =>
        Tables.documents(s, d)
          .repartition(16, col("text"))
          .write.mode("overwrite").parquet(s"$r/docs")
        FileBloom.build(s, s"$r/docs", "doc_id", s"$r/docs_bloom",
          m = 8192, k = 4)
      }
      val (table, bm) = (s"$root/docs", s"$root/docs_bloom")
      graft.sources.BloomFileIndex.read(s, table, bm, "doc_id")
        .filter(col("doc_id").isin(7, 233, 481))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // DYNAMIC PARTITION PRUNING — the star-join skipping Spark itself
    // provides and the canonical 100 TB fact-table read path: the
    // fact lands hive-partitioned by ship month (the layout every
    // date-partitioned lake table has), the month dimension carries
    // the month→quarter mapping, and a quarter filter on the DIM side
    // prunes fact PARTITIONS at runtime — Catalyst plants a
    // DynamicPruningExpression (the broadcast's keys re-used as an IN
    // subquery) into the fact scan's partition filters, so ~3/4 of
    // the directories are never listed into tasks even though no
    // static predicate mentions the partition column. DppSpec pins
    // the plan shape (dynamicpruningexpression present, files read <
    // total) — this row pins the ANSWER: joining through the pruned
    // layout equals the plain quarter filter on the original table.
    "q73_dpp_star_join" -> ((s, d) => {
      // fixture cached per (entry, sf) — see q69 (VERDICT r10 ask #7)
      val root = graft.core.Scratch.cachedDir(s"q73_dpp_$d") { r =>
        val t = s"$r/li_by_month"
        Tables.lineitem(s, d)
          .withColumn("ship_month",
            (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).cast("int"))
          .write.mode("overwrite").partitionBy("ship_month").parquet(t)
        // the month dim: a real warehouse's date dimension, reduced to
        // the two columns the join needs and MATERIALIZED — if quarter
        // stayed an expression over ship_month, constraint propagation
        // would rewrite the dim filter into a STATIC partition predicate
        // on the fact and the demo would never exercise the runtime
        // path; as stored data, only the DPP subquery can prune
        s.read.parquet(t).select("ship_month").distinct()
          .withColumn("quarter", ((col("ship_month") % 100 - 1) / 3 + 1).cast("int"))
          .coalesce(1).write.mode("overwrite").parquet(s"$r/month_dim")
      }
      val table = s"$root/li_by_month"
      val monthDim = s.read.parquet(s"$root/month_dim")
      s.read.parquet(table)
        .join(broadcast(monthDim.filter(col("quarter") === 2)), Seq("ship_month"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(asInt(col("l_quantity"), 0)).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // BUCKET-SORTED ZERO-SHUFFLE ZERO-SORT JOIN — the co-located
    // fact-fact merge join with BOTH heavy phases gone: bucketBy
    // pre-hash-distributes (no exchange — BucketingSpec's original
    // claim) and one-file-per-bucket + sortBy lets the scan CLAIM its
    // on-disk order so SortExec disappears too (the legacy
    // bucketedTableScan.outputOrdering opt-in Spark requires, scoped
    // to this query and run eagerly inside the scope; BucketingSpec
    // pins the no-Sort plan). At 100 TB this is the whole
    // shuffle+sort phase of the dominant join removed by layout.
    "q74_bucket_sorted_join" -> ((s, d) => {
      // fixture cached per (entry, sf); table names carry the sf tag so
      // a second sf in one JVM never repoints the first's catalog
      // entries (VERDICT r10 ask #7). SHA-256 prefix, not hashCode: a
      // 6-hex-digit hashCode suffix can collide across sf dirs, and a
      // collision would repoint the first sf's cached tables at the
      // second's data mid-JVM (ADVICE r11)
      val tag = java.security.MessageDigest.getInstance("SHA-256")
        .digest(d.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      graft.core.Scratch.cachedDir(s"q74_bktsort_$d") { r =>
        def writeBucketed(df: DataFrame, name: String): Unit = {
          s.sql(s"DROP TABLE IF EXISTS $name")
          df.repartition(8, col("l_orderkey")) // one file per bucket
            .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .option("path", s"$r/$name").saveAsTable(name)
        }
        writeBucketed(Tables.lineitem(s, d)
          .select("l_orderkey", "l_quantity", "l_returnflag"), s"g74_li_$tag")
        writeBucketed(Tables.orders(s, d)
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
          s"g74_ord_$tag")
      }
      val key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
      val old = s.conf.getOption(key)
      s.conf.set(key, "true")
      try {
        s.table(s"g74_li_$tag").hint("merge")
          .join(s.table(s"g74_ord_$tag"), Seq("l_orderkey"))
          .groupBy("l_returnflag", "o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(asInt(col("l_quantity"), 0)).as("sum_qty"))
          .localCheckpoint(true) // plan must compile inside the conf scope
          .orderBy("l_returnflag", "o_orderpriority")
      } finally old match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }),

    // STALENESS UNDER THE ORACLE — the in-place-rewrite guard (VERDICT
    // r10 ask #2) proven end-to-end on the driver's own gate, not just
    // in StalenessSpec: a deterministic one-file landing is REWRITTEN
    // under the same name after the zone map was built (the shape of
    // an external compaction/backfill), so its stats row says "this
    // file holds l_partkey < 100" while the live file holds the
    // shifted band [100000, 100050). A probe of the shifted band
    // through readPruned must detect the (length, mtime) mismatch and
    // scan the file anyway — the pre-guard engine returned EMPTY here.
    // The oracle expresses the expected answer over the base table.
    "q75_stale_rewrite_scan" -> ((s, d) => {
      import graft.operators.{ZoneMap, IndexStat}
      import graft.operators.ZoneMap.Range
      val root = graft.core.Scratch.cachedDir(s"q75_stale_$d") { r =>
        val table = s"$r/t"
        val cols = Seq("l_orderkey", "l_linenumber", "l_partkey")
        val li = Tables.lineitem(s, d).select(cols.map(col): _*)
        // landing A: ONE deterministic file (the future victim)
        li.filter(col("l_partkey") < 100)
          .coalesce(1).write.mode("append").parquet(table)
        val victim = ZoneMap.dataFiles(s, table).head
        li.filter(col("l_partkey") >= 100)
          .coalesce(4).write.mode("append").parquet(table)
        ZoneMap.build(s, table, Seq("l_partkey"), s"$r/zm")
        // the external rewrite: same name, shifted band, new fingerprint
        val tmpDir = s"$r/rewrite"
        li.filter(col("l_partkey") < 50)
          .withColumn("l_partkey", col("l_partkey") + 100000L)
          .coalesce(1).write.mode("overwrite").parquet(tmpDir)
        val conf = s.sparkContext.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(tmpDir).getFileSystem(conf)
        val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmpDir))
          .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
        val dst = new org.apache.hadoop.fs.Path(victim)
        fs.delete(dst, false)
        org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false, conf)
        // the maintenance signal names exactly the rewritten file
        require(ZoneMap.staleFiles(s, table, s"$r/zm") ==
          Seq(IndexStat.canon(victim)), "staleFiles missed the rewrite")
      }
      ZoneMap.readPruned(s, s"$root/t", s"$root/zm",
          Seq(Range("l_partkey", 100000, 100100)))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey")
    }),

    // STACKED PLANNING-TIME INDEXES (sources/IndexAdvisor) — the scan-
    // planner move that ties the skipping family together: the table's
    // indexes are REGISTERED once in a catalog sidecar under the table
    // dir (`_graft_indexes`, excluded from every data listing like a
    // lake format's `_delta_log`), and the query states only its
    // PREDICATE — the advisor discovers the zone map and the bloom
    // index from the catalog, selects the layers whose columns the
    // predicate references, and chains them inside a single FileIndex,
    // so the mixed predicate (range on the CLUSTERED dims + IN on an
    // UNCLUSTERED key) opens only the INTERSECTION of what each index
    // allows — one ordinary parquet scan, PushedFilters intact, no
    // index path in the query (VERDICT r11 ask #6).
    // ComposedSkippingSpec pins intersection < either index alone,
    // conservatism, layer selection by predicate shape, and the
    // plain-scan fall-through for unserved predicates; this row pins
    // the ANSWER: the discovered scan equals the plain filter on the
    // original table.
    "q76_composed_skipping" -> ((s, d) => {
      import graft.operators.{FileBloom, ZOrder, ZoneMap}
      val root = graft.core.Scratch.cachedDir(s"q76_advisor_$d") { r =>
        ZOrder.writeZOrdered(
          Tables.lineitem(s, d).select("l_orderkey", "l_linenumber",
            "l_partkey", "l_suppkey", "l_returnflag", "l_quantity"),
          s"$r/li", Seq("l_partkey", "l_suppkey"), bits = 11, files = 16)
        ZoneMap.build(s, s"$r/li", Seq("l_partkey", "l_suppkey"), s"$r/zm")
        FileBloom.build(s, s"$r/li", "l_orderkey", s"$r/bm", m = 8192, k = 4)
        graft.sources.IndexAdvisor.register(s, s"$r/li",
          "zonemap", s"$r/zm", Seq("l_partkey", "l_suppkey"))
        graft.sources.IndexAdvisor.register(s, s"$r/li",
          "bloom", s"$r/bm", Seq("l_orderkey"))
      }
      graft.sources.IndexAdvisor.readDiscovered(s, s"$root/li",
          col("l_partkey").between(50, 1500) &&
            col("l_orderkey").isin(7L, 388L, 1123L))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // SKETCH-INDEX DELETION under the oracle (q62's probe after the
    // round-14 deletion verb): a takedown removes every order row of
    // o_custkey % 5 == 2 inside the probed year, and
    // SketchIndex.deleteRebuild rebuilds ONLY those months from the
    // retained rows (KMV is a k-minimum sample — not subtractive;
    // untouched months keep their files, SketchIndexSpec). The probe
    // then estimates distinct RETAINED custkeys per month and for the
    // merged range; exact sides are computed over the retained rows in
    // both engines, so the within-bound predicate is the oracle-gated
    // proof that deletion left the index answering for corpus∖deleted.
    "q77_sketch_index_delete" -> ((s, d) => {
      import graft.functions.KmvSketch._
      import graft.operators.SketchIndex
      val K = 256
      val kmvMerge = udaf(new graft.functions.KmvMergeAggregator(K))
      val From = 820454400L  // 1996-01-01T00:00:00Z
      val Until = 852076800L // 1997-01-01T00:00:00Z
      val deadRule = col("month_sec") >= From && col("month_sec") < Until &&
        col("o_custkey") % 5 === 2
      // build + writeMonthly + deleteRebuild are lifecycle FIXTURE
      // (the q74/x86/x89 caching discipline — ADVICE r14: rebuilding
      // them inside the timed entry measured fixture construction, and
      // every bench iteration re-paid the full build); the timed path
      // is the post-delete probe a deployment serves
      val root = graft.core.Scratch.cachedDir(s"q77_sketch_del_$d") { r =>
        Tables.orders(s, d).select(
            date_trunc("month", col("o_orderdate")).cast("long").as("month_sec"),
            col("o_custkey"))
          .write.parquet(s"$r/ord")
        SketchIndex.writeMonthly(s.read.parquet(s"$r/ord"),
          "month_sec", "o_custkey", s"$r/sk", K)
        SketchIndex.deleteRebuild(s,
          s.read.parquet(s"$r/ord").filter(!deadRule),
          s.read.parquet(s"$r/ord").filter(deadRule),
          "month_sec", "o_custkey", s"$r/sk", K)
      }
      val ordPath = s"$root/ord"
      val retained = s.read.parquet(ordPath).filter(!deadRule)
      val probed = SketchIndex.probeRange(s, s"$root/sk", From, Until)
      val inRange = retained.filter(
        col("month_sec") >= From && col("month_sec") < Until)
      val monthly = probed
        .join(inRange.groupBy("month_sec")
          .agg(countDistinct("o_custkey").as("exact")), "month_sec")
        .select(col("month_sec"), col("exact"),
          withinPct(estimate(col("sk"), K), col("exact"), 25).as("within_rsd"))
      val total = probed.agg(kmvMerge(col("sk")).as("sk"))
        .crossJoin(broadcast(inRange.agg(countDistinct("o_custkey").as("exact"))))
        .select(lit(-1L).as("month_sec"), col("exact"),
          withinPct(estimate(col("sk"), K), col("exact"), 25).as("within_rsd"))
      monthly.union(total).orderBy("month_sec")
    })
  )

  private val PRICE_C = "CAST(round(l_extendedprice*100) AS BIGINT)"
  private val DISC_C = "CAST(round(l_discount*100) AS BIGINT)"

  private val oraclesBase: Map[String, String] = Map(
    "q01_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(qty) AS BIGINT) AS sum_qty,
        |       CAST(sum(price_c) AS BIGINT) AS sum_base_price_c,
        |       CAST(sum(price_c * (100 - disc_c)) AS BIGINT) AS sum_disc_price_e4,
        |       CAST(sum(price_c * (100 - disc_c) * (100 + tax_c)) AS BIGINT) AS sum_charge_e6,
        |       count(*) AS count_order
        |FROM (SELECT l_returnflag, l_linestatus,
        |             CAST(round(l_quantity) AS BIGINT) AS qty,
        |             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
        |             CAST(round(l_discount * 100) AS BIGINT) AS disc_c,
        |             CAST(round(l_tax * 100) AS BIGINT) AS tax_c
        |      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02')
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_nation_revenue" ->
      s"""SELECT n_name,
         |       CAST(sum($PRICE_C * (100 - $DISC_C)) AS BIGINT) AS revenue_e4,
         |       count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q03_topk_per_group" ->
      """SELECT o_orderpriority, rn, o_orderkey, price_c FROM (
        |  SELECT o_orderpriority,
        |         CAST(row_number() OVER (PARTITION BY o_orderpriority
        |                                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
        |         o_orderkey,
        |         CAST(round(o_totalprice*100) AS BIGINT) AS price_c
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,

    "q04_window_running" ->
      """SELECT o_custkey, o_orderkey, ord_sec, price_c,
        |       CAST(sum(price_c) OVER (PARTITION BY o_custkey ORDER BY ord_sec, o_orderkey
        |                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_c,
        |       lag(price_c) OVER (PARTITION BY o_custkey ORDER BY ord_sec, o_orderkey) AS prev_c,
        |       CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY ord_sec, o_orderkey) AS BIGINT) AS rn
        |FROM (SELECT o_custkey, o_orderkey,
        |             CAST(floor(epoch(o_orderdate)) AS BIGINT) AS ord_sec,
        |             CAST(round(o_totalprice*100) AS BIGINT) AS price_c
        |      FROM orders)
        |ORDER BY o_custkey, rn""".stripMargin,

    "q05_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(qty) AS BIGINT) AS sum_qty, count(*) AS n,
        |       CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS gid
        |FROM (SELECT l_returnflag, l_linestatus, CAST(round(l_quantity) AS BIGINT) AS qty
        |      FROM lineitem)
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,

    "q06_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(sum(price_c) AS BIGINT) AS sum_price_c, count(*) AS n,
        |       CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
        |FROM (SELECT o_orderstatus, o_orderpriority,
        |             CAST(round(o_totalprice*100) AS BIGINT) AS price_c FROM orders)
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin,

    "q07_distinct_agg" ->
      """SELECT event_type,
        |       count(DISTINCT user_id) AS n_users,
        |       count(*) AS n_events,
        |       CAST(round(min(value)*100) AS BIGINT) AS min_value_c,
        |       CAST(round(max(value)*100) AS BIGINT) AS max_value_c
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q08_setops" ->
      """(SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        | INTERSECT
        | SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin,

    "q09_semi_anti" ->
      """SELECT p_partkey, 'has_big' AS tag FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 49)
        |UNION ALL
        |SELECT p_partkey, 'no_big' AS tag FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 49)
        |ORDER BY p_partkey""".stripMargin,

    "q10_range_join" ->
      """SELECT o_orderkey, count(*) AS n_early,
        |       CAST(sum(qty) AS BIGINT) AS qty_early
        |FROM (SELECT l_orderkey, CAST(floor(epoch(l_shipdate)) AS BIGINT) AS ssec,
        |             CAST(round(l_quantity) AS BIGINT) AS qty FROM lineitem) li
        |JOIN (SELECT o_orderkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS osec
        |      FROM orders) o
        |  ON li.l_orderkey = o.o_orderkey
        | AND li.ssec >= o.osec AND li.ssec < o.osec + 2592000
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "q11_asof_join" ->
      """SELECT l.event_id, l.user_id, l.evt_sec, r.ord_sec, r.o_orderkey
        |FROM (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS evt_sec
        |      FROM events) l
        |ASOF LEFT JOIN (
        |      SELECT o_custkey AS user_id, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS ord_sec,
        |             max(o_orderkey) AS o_orderkey
        |      FROM orders GROUP BY 1, 2) r
        |  ON l.user_id = r.user_id AND l.evt_sec >= r.ord_sec
        |ORDER BY event_id""".stripMargin,

    "q31_stratified_sample" ->
      """SELECT doc_id, lang, source, n_chars,
        |       CAST(CASE WHEN lang = 'en' THEN 50
        |                 WHEN lang = 'fr' THEN 25 ELSE 10 END AS BIGINT) AS rate_pct
        |FROM documents
        |WHERE ('0x' || substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
        |      < CASE WHEN lang = 'en' THEN 50 WHEN lang = 'fr' THEN 25 ELSE 10 END
        |ORDER BY doc_id""".stripMargin,

    "q32_zorder_key" ->
      s"""SELECT event_id, (user_id % 1024) AS zx,
         |       (CAST(floor(value * 100) AS BIGINT) % 1024) AS zy,
         |       ${ZOrder.zkeySql(Seq("(user_id % 1024)", "(CAST(floor(value * 100) AS BIGINT) % 1024)"), bits = 10)} AS zkey
         |FROM events ORDER BY event_id""".stripMargin,

    "q34_snapshot_merge" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
        |           FROM orders),
        |allr AS (
        |  SELECT o_orderkey, o_custkey, price_c, 0 AS ver, 'u' AS op FROM o WHERE o_orderkey % 3 <> 0
        |  UNION ALL SELECT o_orderkey, o_custkey, price_c, 1, 'u' FROM o WHERE o_orderkey % 3 = 0
        |  UNION ALL SELECT o_orderkey, o_custkey, price_c + 100000, 2, 'u' FROM o WHERE o_orderkey % 7 = 0
        |  UNION ALL SELECT o_orderkey, o_custkey, price_c, 3, 'd' FROM o WHERE o_orderkey % 10 = 0),
        |latest AS (SELECT *, row_number() OVER (
        |             PARTITION BY o_orderkey ORDER BY ver DESC, op DESC) AS rn
        |           FROM allr)
        |SELECT o_orderkey, o_custkey, price_c, CAST(ver AS BIGINT) AS ver
        |FROM latest WHERE rn = 1 AND op = 'u' ORDER BY o_orderkey""".stripMargin,

    // the oracle is the UNSALTED join: hash equality IS the
    // salting-changes-nothing proof
    "q35_salted_join" ->
      """SELECT o_custkey, count(*) AS n_items,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    // forward = backward ASOF over NEGATED times: max(-ord_sec) with
    // -evt_sec >= -ord_sec is exactly min(ord_sec >= evt_sec)
    "q29_asof_forward" ->
      """SELECT l.event_id, l.user_id, l.evt_sec, r.ord_sec, r.o_orderkey
        |FROM (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS evt_sec,
        |             -CAST(floor(epoch(ts)) AS BIGINT) AS neg
        |      FROM events) l
        |ASOF LEFT JOIN (
        |      SELECT user_id, ord_sec, -ord_sec AS neg, o_orderkey FROM (
        |        SELECT o_custkey AS user_id, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS ord_sec,
        |               max(o_orderkey) AS o_orderkey
        |        FROM orders GROUP BY 1, 2)) r
        |  ON l.user_id = r.user_id AND l.neg >= r.neg
        |ORDER BY event_id""".stripMargin,

    // nearest-with-tolerance = choose the closer of the backward ASOF
    // and the (negated-time) forward ASOF, ties backward, both sides
    // nulled beyond 30 days — mirrors AsOfJoin.nearest exactly
    "q30_asof_nearest" ->
      """WITH l AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS evt_sec FROM events),
        |r AS (SELECT o_custkey AS user_id, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS ord_sec,
        |             max(o_orderkey) AS o_orderkey
        |      FROM orders GROUP BY 1, 2),
        |bwd AS (SELECT l.event_id, l.user_id, l.evt_sec, r.ord_sec AS p_sec, r.o_orderkey AS p_key
        |        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.evt_sec >= r.ord_sec),
        |fwd AS (SELECT l.event_id, r.ord_sec AS n_sec, r.o_orderkey AS n_key
        |        FROM (SELECT *, -evt_sec AS neg FROM l) l
        |        ASOF LEFT JOIN (SELECT *, -ord_sec AS neg FROM r) r
        |          ON l.user_id = r.user_id AND l.neg >= r.neg),
        |tol AS (SELECT b.event_id, b.user_id, b.evt_sec,
        |               CASE WHEN b.evt_sec - p_sec <= 2592000 THEN p_sec END AS p_sec,
        |               CASE WHEN b.evt_sec - p_sec <= 2592000 THEN p_key END AS p_key,
        |               CASE WHEN n_sec - b.evt_sec <= 2592000 THEN n_sec END AS n_sec,
        |               CASE WHEN n_sec - b.evt_sec <= 2592000 THEN n_key END AS n_key
        |        FROM bwd b JOIN fwd f USING (event_id))
        |SELECT event_id, user_id, evt_sec,
        |       CASE WHEN n_sec IS NULL THEN p_sec
        |            WHEN p_sec IS NULL THEN n_sec
        |            WHEN evt_sec - p_sec <= n_sec - evt_sec THEN p_sec ELSE n_sec END AS ord_sec,
        |       CASE WHEN n_sec IS NULL THEN p_key
        |            WHEN p_sec IS NULL THEN n_key
        |            WHEN evt_sec - p_sec <= n_sec - evt_sec THEN p_key ELSE n_key END AS o_orderkey
        |FROM tol
        |ORDER BY event_id""".stripMargin,

    "q28_gap_fill" ->
      """WITH actual AS (
        |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT event_type, min(day) AS d0, max(day) AS d1
        |           FROM actual GROUP BY 1),
        |alldays AS (SELECT event_type, unnest(generate_series(d0, d1)) AS day
        |            FROM bounds)
        |SELECT f.event_type, f.day, CAST(coalesce(a.n, 0) AS BIGINT) AS n
        |FROM alldays f LEFT JOIN actual a USING (event_type, day)
        |ORDER BY event_type, day""".stripMargin,

    // same oracle as q11 — the native operator must agree with DuckDB's
    // built-in ASOF LEFT JOIN on the same inputs
    "q26_asof_native" ->
      """SELECT l.event_id, l.user_id, l.evt_sec, r.ord_sec, r.o_orderkey
        |FROM (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS evt_sec
        |      FROM events) l
        |ASOF LEFT JOIN (
        |      SELECT o_custkey AS user_id, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS ord_sec,
        |             max(o_orderkey) AS o_orderkey
        |      FROM orders GROUP BY 1, 2) r
        |  ON l.user_id = r.user_id AND l.evt_sec >= r.ord_sec
        |ORDER BY event_id""".stripMargin,

    "q12_string_funcs" ->
      """SELECT p_partkey,
        |       upper(p_name) AS name_u,
        |       substr(p_name, 1, 8) AS name_pre,
        |       CAST(length(p_name) AS BIGINT) AS name_len,
        |       CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num,
        |       p_type || '|' || p_brand AS type_brand,
        |       string_split(p_name, ' ')[1] AS first_word,
        |       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q13_date_funcs" ->
      """SELECT CAST(floor(epoch(date_trunc('month', o_orderdate))) AS BIGINT) AS month_sec,
        |       CAST(year(o_orderdate) AS INTEGER) AS y,
        |       CAST(month(o_orderdate) AS INTEGER) AS m,
        |       CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_c,
        |       count(*) AS n
        |FROM orders
        |GROUP BY 1, 2, 3, 4 ORDER BY month_sec""".stripMargin,

    "q14_json" ->
      """SELECT event_type,
        |       CAST(sum(k) AS BIGINT) AS sum_k,
        |       count(CASE WHEN k > 50 THEN 1 END) AS n_big,
        |       count(*) AS n
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q15_array_funcs" ->
      """SELECT vec_id,
        |       CAST(len(embedding) AS BIGINT) AS dim,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT), q), (a, x) -> a + x) AS sum_e6,
        |       list_min(q) AS min_e6,
        |       list_max(q) AS max_e6,
        |       q[1] AS first_e6
        |FROM (SELECT vec_id, embedding,
        |             list_transform(embedding,
        |               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
        |      FROM embeddings)
        |ORDER BY vec_id""".stripMargin,

    "q16_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(qty) AS BIGINT) AS sum_qty, count(*) AS n
        |FROM (SELECT l_returnflag, l_linestatus, CAST(round(l_quantity) AS BIGINT) AS qty
        |      FROM lineitem)
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q17_pivot" ->
      """SELECT o_orderpriority,
        |       count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |       count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |       count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q19_histogram" ->
      """SELECT CAST(floor(value / 5.0) AS BIGINT) AS bucket,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q20_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS evt_sec FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, evt_sec,
        |         CASE WHEN evt_sec - lag(evt_sec) OVER w > 1800 THEN 1
        |              WHEN lag(evt_sec) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY evt_sec, event_id)),
        |sess AS (
        |  SELECT user_id, evt_sec,
        |         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY evt_sec, event_id
        |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       min(evt_sec) AS start_sec, max(evt_sec) AS end_sec
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q21_hash_sample" ->
      """SELECT l_returnflag, count(*) AS n_sampled,
        |       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE ('0x' || substr(md5(l_orderkey || '-' || l_linenumber), 1, 15))::BIGINT % 100 < 7
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q23_map_explode" ->
      """SELECT event_id, key, val FROM (
        |  SELECT event_id, 'k' AS key, CAST(json_extract_string(props, '$.k') AS BIGINT) AS val FROM events
        |  UNION ALL
        |  SELECT event_id, 'value_c' AS key, CAST(round(value*100) AS BIGINT) AS val FROM events)
        |ORDER BY event_id, key""".stripMargin,

    "q25_salted_agg" ->
      """SELECT event_type,
        |       CAST(sum(user_id) AS BIGINT) AS sum_uid,
        |       count(*) AS n_events,
        |       min(event_id) AS min_eid,
        |       max(event_id) AS max_eid,
        |       array_to_string(list_sort(list(DISTINCT user_id % 50)), ',') AS uniq_uid_buckets
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q24_multiset_ops" ->
      """WITH y96 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
        |y97 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997),
        |common AS (SELECT o_custkey, count(*) AS n_common
        |           FROM (SELECT * FROM y96 INTERSECT ALL SELECT * FROM y97)
        |           GROUP BY o_custkey),
        |only96 AS (SELECT o_custkey, count(*) AS n_only96
        |           FROM (SELECT * FROM y96 EXCEPT ALL SELECT * FROM y97)
        |           GROUP BY o_custkey)
        |SELECT o_custkey,
        |       COALESCE(n_common, 0) AS n_common,
        |       COALESCE(n_only96, 0) AS n_only96
        |FROM common FULL OUTER JOIN only96 USING (o_custkey)
        |ORDER BY o_custkey""".stripMargin,

    "q22_quantiles" ->
      """WITH v AS (SELECT event_type, event_id, CAST(round(value*100) AS BIGINT) AS value_c FROM events),
        |ranked AS (
        |  SELECT event_type, value_c,
        |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY value_c, event_id) AS BIGINT) AS rn,
        |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM v)
        |SELECT event_type,
        |       max(CASE WHEN rn = CAST(ceil(n / 4.0) AS BIGINT) THEN value_c END) AS q1_c,
        |       max(CASE WHEN rn = CAST(ceil(n / 2.0) AS BIGINT) THEN value_c END) AS median_c,
        |       max(CASE WHEN rn = CAST(ceil(n * 3.0 / 4.0) AS BIGINT) THEN value_c END) AS q3_c,
        |       max(n) AS n
        |FROM ranked GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q36_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, CAST(value AS BIGINT) AS value
        |FROM (SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |             CAST(round(l_quantity) AS BIGINT) AS qty,
        |             CAST(round(l_extendedprice*100) AS BIGINT) AS price_c,
        |             CAST(round(l_discount*100) AS BIGINT) AS disc_c
        |      FROM lineitem WHERE l_orderkey % 5 = 0)
        |UNPIVOT (value FOR metric IN (qty, price_c, disc_c))
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,

    "q37_window_ranks" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |                  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS ord_sec,
        |                  CAST(round(o_totalprice*100) AS BIGINT) AS price_c
        |           FROM orders)
        |SELECT o_custkey, o_orderkey, ord_sec, price_c,
        |       CAST(rank()       OVER w1 AS BIGINT) AS rnk,
        |       CAST(dense_rank() OVER w1 AS BIGINT) AS drnk,
        |       CAST(round(percent_rank() OVER w1 * 1000000) AS BIGINT) AS prank_e6,
        |       CAST(round(cume_dist()    OVER w1 * 1000000) AS BIGINT) AS cdist_e6,
        |       CAST(ntile(4) OVER w2 AS BIGINT) AS quartile,
        |       lead(o_orderkey) OVER w2 AS next_key
        |FROM o
        |WINDOW w1 AS (PARTITION BY o_custkey ORDER BY ord_sec),
        |       w2 AS (PARTITION BY o_custkey ORDER BY ord_sec, o_orderkey)
        |ORDER BY o_custkey, ord_sec, o_orderkey""".stripMargin,

    "q38_sql_api" ->
      """SELECT n.n_name,
        |       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
        |                * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
        |       COUNT(*) AS n_items
        |FROM customer c
        |JOIN orders o   ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN nation n   ON c.c_nationkey = n.n_nationkey
        |JOIN region r   ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND CAST(ROUND(o.o_totalprice * 100) AS BIGINT) >
        |      (SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |              // COUNT(*)
        |       FROM orders)
        |GROUP BY n.n_name
        |ORDER BY revenue_e4 DESC, n_name""".stripMargin,

    "q39_range_frame" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |                  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS ord_sec,
        |                  CAST(round(o_totalprice*100) AS BIGINT) AS price_c
        |           FROM orders)
        |SELECT o_custkey, o_orderkey, ord_sec, price_c,
        |       CAST(sum(price_c) OVER w AS BIGINT) AS sum90d_c,
        |       CAST(count(*) OVER w AS BIGINT) AS n90d
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY ord_sec
        |             RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, ord_sec, o_orderkey""".stripMargin,

    "q40_quality_gate" ->
      """WITH t AS (SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN coalesce(l_discount BETWEEN 0.0 AND 0.05, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS disc_range,
        |  CAST(sum(CASE WHEN coalesce(l_returnflag IN ('A','N','R'), FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS flag_domain,
        |  CAST(sum(CASE WHEN coalesce(l_linenumber BETWEEN 1 AND 7, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS line_range,
        |  CAST(sum(CASE WHEN coalesce(l_extendedprice > 0.0, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS price_positive,
        |  CAST(sum(CASE WHEN coalesce(l_quantity BETWEEN 1.0 AND 30.0, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS qty_range
        |  FROM lineitem)
        |SELECT rule, n_bad, n_rows FROM (
        |  SELECT 'disc_range' AS rule, disc_range AS n_bad, n_rows FROM t
        |  UNION ALL SELECT 'flag_domain', flag_domain, n_rows FROM t
        |  UNION ALL SELECT 'line_range', line_range, n_rows FROM t
        |  UNION ALL SELECT 'price_positive', price_positive, n_rows FROM t
        |  UNION ALL SELECT 'qty_range', qty_range, n_rows FROM t)
        |ORDER BY rule""".stripMargin,

    "q41_triangles" ->
      """WITH pairs AS (SELECT DISTINCT l_orderkey, l_partkey
        |               FROM lineitem WHERE l_linenumber <= 4),
        |edges AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |          FROM pairs x JOIN pairs y USING (l_orderkey)
        |          WHERE x.l_partkey < y.l_partkey)
        |SELECT (SELECT count(*) FROM edges e1
        |        JOIN edges e2 ON e1.b = e2.a
        |        JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles,
        |       (SELECT count(*) FROM edges) AS n_edges""".stripMargin,

    "q42_union_by_name" ->
      """WITH u AS (
        |  SELECT o_orderkey, o_custkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_c
        |  FROM orders WHERE year(o_orderdate) = 1996
        |  UNION ALL BY NAME
        |  SELECT o_custkey, o_orderkey FROM orders WHERE year(o_orderdate) = 1997)
        |SELECT o_custkey, count(*) AS n_orders,
        |       CAST(sum(coalesce(price_c, 0)) AS BIGINT) AS sum_price_c
        |FROM u GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q43_ratio_to_report" ->
      """WITH rev AS (
        |  SELECT r.r_name, n.n_name,
        |         CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM customer c
        |  JOIN orders o ON c.c_custkey = o.o_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY r.r_name, n.n_name)
        |SELECT r_name, n_name, rev_c,
        |       CAST(sum(rev_c) OVER (PARTITION BY r_name) AS BIGINT) AS region_rev_c,
        |       CAST((rev_c * 1000000) // sum(rev_c) OVER (PARTITION BY r_name) AS BIGINT) AS share_e6
        |FROM rev ORDER BY r_name, n_name""".stripMargin,

    "q44_pagerank" -> {
      // one unrolled PageRank round: contribs from rPrev, then the
      // teleport base + damped sum — all divisions integer (//)
      def round(rPrev: String, c: String, r: String): String =
        s"""$c AS (SELECT e.dst AS node,
           |           CAST(sum(r.rank_e9 // o.odeg) AS BIGINT) AS s
           |    FROM edges e JOIN $rPrev r ON e.src = r.node
           |    JOIN outdeg o ON e.src = o.src GROUP BY 1),
           |$r AS (SELECT n2.node,
           |           (CAST(150000000 AS BIGINT) // nn.n)
           |         + ((85 * coalesce($c.s, CAST(0 AS BIGINT))) // 100) AS rank_e9
           |    FROM nodes n2 LEFT JOIN $c USING (node), nn)""".stripMargin
      s"""WITH pairs AS (SELECT DISTINCT l_orderkey, l_partkey
         |               FROM lineitem WHERE l_linenumber <= 4),
         |und AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
         |        FROM pairs x JOIN pairs y USING (l_orderkey)
         |        WHERE x.l_partkey < y.l_partkey),
         |edges AS (SELECT a AS src, b AS dst FROM und
         |          UNION ALL SELECT b, a FROM und),
         |nodes AS (SELECT src AS node FROM edges
         |          UNION SELECT dst FROM edges),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         |outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS odeg
         |           FROM edges GROUP BY 1),
         |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) // nn.n AS rank_e9
         |       FROM nodes, nn),
         |${round("r0", "c1", "r1")},
         |${round("r1", "c2", "r2")},
         |${round("r2", "c3", "r3")}
         |SELECT node, CAST(rank_e9 AS BIGINT) AS rank_e9
         |FROM r3 ORDER BY node""".stripMargin
    },

    "q45_bfs_hops" ->
      """WITH RECURSIVE pairs AS (SELECT DISTINCT l_orderkey, l_partkey
        |               FROM lineitem WHERE l_linenumber <= 4),
        |und AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |        FROM pairs x JOIN pairs y USING (l_orderkey)
        |        WHERE x.l_partkey < y.l_partkey),
        |edges AS (SELECT a AS src, b AS dst FROM und
        |          UNION ALL SELECT b, a FROM und),
        |seeds AS (SELECT DISTINCT l_partkey AS node FROM pairs
        |          WHERE l_partkey % 509 = 0),
        |reach AS (SELECT node, 0 AS hop FROM seeds
        |          UNION
        |          SELECT e.dst, r.hop + 1 FROM reach r
        |          JOIN edges e ON r.node = e.src WHERE r.hop < 3)
        |SELECT node, CAST(min(hop) AS BIGINT) AS hops
        |FROM reach GROUP BY node ORDER BY node""".stripMargin,

    "q46_collapse_consecutive" ->
      """WITH e AS (SELECT event_id, user_id,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS evt_sec, event_type
        |           FROM events),
        |fl AS (SELECT *, lag(event_type) OVER (
        |         PARTITION BY user_id ORDER BY evt_sec, event_id) AS prev_type
        |       FROM e)
        |SELECT event_id, user_id, evt_sec, event_type
        |FROM fl WHERE prev_type IS NULL OR prev_type <> event_type
        |ORDER BY event_id""".stripMargin,

    "q47_interval_join" ->
      """WITH e AS (SELECT event_id, user_id,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS evt_sec FROM events),
        |w AS (SELECT event_id AS win_id, evt_sec AS w0, evt_sec + 3600 AS w1
        |      FROM e WHERE event_id % 2000 = 0)
        |SELECT win_id, count(*) AS n_events,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM e JOIN w ON e.evt_sec >= w.w0 AND e.evt_sec < w.w1
        |GROUP BY win_id ORDER BY win_id""".stripMargin,

    // each event belongs to the 4 epoch-aligned 900 s starts in
    // (sec-3600, sec] — exactly Spark's window(ts, '1 hour', '15 min')
    "q48_hopping_window" ->
      """WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |           FROM events),
        |x AS (SELECT user_id, ((sec // 900) - k) * 900 AS ws
        |      FROM e CROSS JOIN generate_series(0, 3) AS t(k))
        |SELECT ws, count(*) AS n_events,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM x GROUP BY ws ORDER BY ws""".stripMargin,

    // declarative dominance (NOT EXISTS) — the O(n²) definition the
    // Spark side's bucket + prefix-max plan must reproduce exactly
    "q49_skyline" ->
      """WITH p AS (SELECT CAST(round(p_retailprice*100) AS BIGINT) AS price_c,
        |                  CAST(max(p_size) AS BIGINT) AS sz
        |           FROM part GROUP BY 1)
        |SELECT price_c, sz FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.price_c <= a.price_c AND b.sz >= a.sz
        |    AND (b.price_c < a.price_c OR b.sz > a.sz))
        |ORDER BY price_c""".stripMargin,

    "q50_scd2_build" ->
      """WITH ch AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
        |         lag(o_orderstatus) OVER w AS prev_status
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
        |f AS (SELECT * FROM ch
        |      WHERE prev_status IS NULL OR prev_status <> o_orderstatus)
        |SELECT o_custkey, o_orderstatus AS status, o_orderdate AS valid_from,
        |       lead(o_orderdate) OVER w AS valid_to,
        |       CAST(lead(o_orderdate) OVER w IS NULL AS INTEGER) AS is_current
        |FROM f
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, valid_from, status""".stripMargin,

    "q51_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |t1 AS (SELECT user_id, min(sec) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(sec) AS t2 FROM e JOIN t1 USING (user_id)
        |       WHERE event_type = 'click' AND sec > t1 GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(sec) AS t3 FROM e JOIN t2 USING (user_id)
        |       WHERE event_type = 'purchase' AND sec > t2 GROUP BY 1)
        |SELECT '1_view' AS step, CAST(count(*) AS BIGINT) AS n_users FROM t1
        |UNION ALL
        |SELECT '2_click', CAST(count(*) AS BIGINT) FROM t2
        |UNION ALL
        |SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM t3
        |ORDER BY step""".stripMargin,

    "q52_cohort_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |                   CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS week
        |            FROM events),
        |c AS (SELECT user_id, min(week) AS cohort_w FROM uw GROUP BY 1)
        |SELECT cohort_w, week - cohort_w AS offset_w,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM uw JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_w, offset_w""".stripMargin
  )

  /** q53/q54 run the NATIVE as-of execs against the composed variants'
    * oracles verbatim — the two paths must answer identically.
    */
  val oracles: Map[String, String] = oraclesBase ++ Map(
    "q53_asof_native_forward" -> oraclesBase("q29_asof_forward"),
    "q54_asof_native_nearest" -> oraclesBase("q30_asof_nearest"),

    // q56: exact_c is the discrete quantile via the integer
    // cumulative walk (cum ≥ ceil(q·n) ⇔ cum·1e6 ≥ n·qe6 for integer
    // cum) — reproduced natively here, so it is hash-checked
    // cross-engine; within_rel asserts the sketch estimate's α bound.
    "q56_ddsketch_rollup" ->
      """WITH v AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS value_c
        |           FROM events),
        |counts AS (SELECT event_type, value_c, count(*) AS cnt
        |           FROM v GROUP BY 1, 2),
        |cums AS (SELECT event_type, value_c,
        |                sum(cnt) OVER (PARTITION BY event_type
        |                               ORDER BY value_c) AS cum,
        |                sum(cnt) OVER (PARTITION BY event_type) AS n
        |         FROM counts),
        |qs AS (SELECT CAST(unnest([500000, 950000, 990000]) AS BIGINT) AS qe6)
        |SELECT c.event_type, q.qe6, CAST(max(c.n) AS BIGINT) AS n,
        |       CAST(min(CASE WHEN c.cum * 1000000 >= c.n * q.qe6
        |                     THEN c.value_c END) AS BIGINT) AS exact_c,
        |       CAST(1 AS BIGINT) AS within_rel
        |FROM cums c CROSS JOIN qs q
        |GROUP BY c.event_type, q.qe6
        |ORDER BY c.event_type, q.qe6""".stripMargin,

    // q55: the oracle asserts the bound HOLDS (within_rsd = 1) per
    // month and for the merged total (month_sec = -1); exact sides
    // are DuckDB's own distinct counts.
    "q55_sketch_partial_merge" ->
      """SELECT month_sec, exact, CAST(1 AS BIGINT) AS within_rsd FROM (
        |  SELECT CAST(floor(epoch(date_trunc('month', o_orderdate))) AS BIGINT) AS month_sec,
        |         CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact
        |  FROM orders GROUP BY 1
        |  UNION ALL
        |  SELECT -1, CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
        |) ORDER BY month_sec""".stripMargin,

    // bounded-error sketch checks (VERDICT r7 ask #5): the oracle's
    // claim is that the documented accuracy bound HOLDS — the exact
    // side is DuckDB's own computation, the predicate the sketch's
    // published guarantee (see the queries' scaladoc)
    "q27b_approx_quantiles_bound" ->
      """SELECT l_orderkey % 3 AS grp, CAST(1 AS BIGINT) AS within_bound
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q33b_heavy_hitters_bound" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |c AS (SELECT token, count(*) AS cnt FROM t GROUP BY 1),
        |r AS (SELECT token, row_number() OVER (ORDER BY cnt DESC, token) AS rnk FROM c)
        |SELECT token, CAST(rnk AS BIGINT) AS rnk, CAST(1 AS BIGINT) AS within_bound
        |FROM r WHERE rnk <= 5 ORDER BY rnk""".stripMargin,

    // q57: bloom-filter pruning is semantically transparent — the
    // oracle is the PLAIN selective join, so any row the injected
    // filter wrongly dropped breaks the hash
    "q57_bloom_pruned_join" ->
      """SELECT p_brand, count(*) AS n_items,
        |       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size = 1
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // q58: exact overlap matrix cross-engine; the within_* flags
    // assert the theta-sketch estimates' documented bounds hold.
    // Pairs come from sz×sz with iv LEFT-joined (coalesce 0) so a
    // disjoint year pair stays in the matrix on both engines.
    "q58_theta_sketch_setops" ->
      """WITH yk AS (SELECT DISTINCT year(l_shipdate) AS y, l_partkey AS k FROM lineitem),
        |sz AS (SELECT y, count(*) AS n FROM yk GROUP BY 1),
        |iv AS (SELECT a.y AS year_a, b.y AS year_b, count(*) AS exact_inter
        |       FROM yk a JOIN yk b ON a.k = b.k AND a.y < b.y GROUP BY 1, 2)
        |SELECT CAST(sa.y AS BIGINT) AS year_a, CAST(sb.y AS BIGINT) AS year_b,
        |       CAST(sa.n AS BIGINT) AS exact_a, CAST(sb.n AS BIGINT) AS exact_b,
        |       CAST(COALESCE(iv.exact_inter, 0) AS BIGINT) AS exact_inter,
        |       CAST(sa.n + sb.n - COALESCE(iv.exact_inter, 0) AS BIGINT) AS exact_union,
        |       CAST(1 AS BIGINT) AS within_a, CAST(1 AS BIGINT) AS within_b,
        |       CAST(1 AS BIGINT) AS within_inter, CAST(1 AS BIGINT) AS within_union,
        |       CAST(1 AS BIGINT) AS within_diff
        |FROM sz sa JOIN sz sb ON sa.y < sb.y
        |LEFT JOIN iv ON iv.year_a = sa.y AND iv.year_b = sb.y
        |ORDER BY year_a, year_b""".stripMargin,

    // q59: q55's oracle shape with one extra scope — month_sec = -2 is
    // the count of customers active in BOTH halves of the history
    // (split at 1998-01-01 = epoch 883612800), the intersection a
    // stored-HLL rollup cannot produce; all flags assert the sketch
    // bounds hold
    "q59_theta_partial_merge" ->
      """WITH m AS (SELECT CAST(floor(epoch(date_trunc('month', o_orderdate))) AS BIGINT) AS month_sec,
        |                  o_custkey
        |           FROM orders)
        |SELECT month_sec, exact, CAST(1 AS BIGINT) AS within_rsd FROM (
        |  SELECT month_sec, CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact
        |  FROM m GROUP BY 1
        |  UNION ALL
        |  SELECT -1, CAST(count(DISTINCT o_custkey) AS BIGINT) FROM m
        |  UNION ALL
        |  SELECT -2, CAST(count(*) AS BIGINT) FROM (
        |    SELECT o_custkey FROM m GROUP BY o_custkey
        |    HAVING count(DISTINCT month_sec >= 883612800) = 2)
        |) ORDER BY month_sec""".stripMargin,

    // q60: the whole computation is deterministic integer arithmetic
    // on the shared md5-prefix hash, so DuckDB reproduces the sketch
    // AND the estimate exactly — per-depth inner products (d 0..3),
    // the min (d = -1), and the exact join size (d = -2); est >= exact
    // is the CM guarantee the two rows exhibit
    "q60_cm_join_estimate" ->
      """WITH ds AS (SELECT CAST(unnest([0,1,2,3]) AS BIGINT) AS d),
        |a AS (SELECT d, h % 65536 AS w, count(*) AS cnt_a FROM (
        |        SELECT ds.d,
        |               (('0x'||substr(md5('cm'||CAST(ds.d AS VARCHAR)||':'||CAST(l_orderkey AS VARCHAR)),1,15))::BIGINT) AS h
        |        FROM lineitem CROSS JOIN ds) GROUP BY 1, 2),
        |b AS (SELECT d, h % 65536 AS w, count(*) AS cnt_b FROM (
        |        SELECT ds.d,
        |               (('0x'||substr(md5('cm'||CAST(ds.d AS VARCHAR)||':'||CAST(o_orderkey AS VARCHAR)),1,15))::BIGINT) AS h
        |        FROM orders CROSS JOIN ds) GROUP BY 1, 2),
        |i AS (SELECT d, CAST(sum(cnt_a * cnt_b) AS BIGINT) AS inner_e
        |      FROM a JOIN b USING (d, w) GROUP BY 1)
        |SELECT d, inner_e FROM i
        |UNION ALL SELECT -1, CAST(min(inner_e) AS BIGINT) FROM i
        |UNION ALL SELECT -2, count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY d""".stripMargin,

    // q61: q58's oracle verbatim in shape — the Spark side differs
    // only in SURFACE (pure spark.sql over the registered functions),
    // so the exact matrix and the expected-true bound flags match
    "q61_sql_sketch_algebra" ->
      """WITH yk AS (SELECT DISTINCT year(l_shipdate) AS y, l_partkey AS k FROM lineitem),
        |sz AS (SELECT y, count(*) AS n FROM yk GROUP BY 1),
        |iv AS (SELECT a.y AS year_a, b.y AS year_b, count(*) AS exact_inter
        |       FROM yk a JOIN yk b ON a.k = b.k AND a.y < b.y GROUP BY 1, 2)
        |SELECT CAST(sa.y AS BIGINT) AS year_a, CAST(sb.y AS BIGINT) AS year_b,
        |       CAST(sa.n AS BIGINT) AS exact_a, CAST(sb.n AS BIGINT) AS exact_b,
        |       CAST(COALESCE(iv.exact_inter, 0) AS BIGINT) AS exact_inter,
        |       CAST(sa.n + sb.n - COALESCE(iv.exact_inter, 0) AS BIGINT) AS exact_union,
        |       CAST(1 AS BIGINT) AS within_a, CAST(1 AS BIGINT) AS within_b,
        |       CAST(1 AS BIGINT) AS within_inter, CAST(1 AS BIGINT) AS within_union,
        |       CAST(1 AS BIGINT) AS within_diff
        |FROM sz sa JOIN sz sb ON sa.y < sb.y
        |LEFT JOIN iv ON iv.year_a = sa.y AND iv.year_b = sb.y
        |ORDER BY year_a, year_b""".stripMargin,

    // q62: q59's oracle shape restricted to the probed 1996 range;
    // monthly sketches are exhaustive so flags assert the bound holds
    "q62_sketch_index_probe" ->
      """WITH m AS (SELECT CAST(floor(epoch(date_trunc('month', o_orderdate))) AS BIGINT) AS month_sec,
        |                  o_custkey
        |           FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |             AND o_orderdate < TIMESTAMP '1997-01-01')
        |SELECT month_sec, exact, CAST(1 AS BIGINT) AS within_rsd FROM (
        |  SELECT month_sec, CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact
        |  FROM m GROUP BY 1
        |  UNION ALL
        |  SELECT -1, CAST(count(DISTINCT o_custkey) AS BIGINT) FROM m
        |) ORDER BY month_sec""".stripMargin,

    // q62's shape over corpus∖deleted: the exact sides count RETAINED
    // custkeys only — the index, having rebuilt exactly the tombstoned
    // months, must estimate those same retained sets within bound
    "q77_sketch_index_delete" ->
      """WITH m AS (SELECT CAST(floor(epoch(date_trunc('month', o_orderdate))) AS BIGINT) AS month_sec,
        |                  o_custkey
        |           FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |             AND o_orderdate < TIMESTAMP '1997-01-01'
        |             AND o_custkey % 5 <> 2)
        |SELECT month_sec, exact, CAST(1 AS BIGINT) AS within_rsd FROM (
        |  SELECT month_sec, CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact
        |  FROM m GROUP BY 1
        |  UNION ALL
        |  SELECT -1, CAST(count(DISTINCT o_custkey) AS BIGINT) FROM m
        |) ORDER BY month_sec""".stripMargin,

    // q67: same oracle arithmetic as q62 — the staged/compacted/
    // staged-again index is a pure set-function of the rows, so the
    // lifecycle must reproduce the one-shot build's probe answer
    "q67_sketch_index_lifecycle" ->
      """WITH m AS (SELECT CAST(floor(epoch(date_trunc('month', o_orderdate))) AS BIGINT) AS month_sec,
        |                  o_custkey
        |           FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |             AND o_orderdate < TIMESTAMP '1997-01-01')
        |SELECT month_sec, exact, CAST(1 AS BIGINT) AS within_rsd FROM (
        |  SELECT month_sec, CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact
        |  FROM m GROUP BY 1
        |  UNION ALL
        |  SELECT -1, CAST(count(DISTINCT o_custkey) AS BIGINT) FROM m
        |) ORDER BY month_sec""".stripMargin,

    // q68: broadcast hints are semantically transparent — the
    // sketch-planned join must reproduce the plain join+agg exactly
    "q68_sketch_broadcast_join" ->
      """SELECT l_returnflag, count(*) AS n,
        |       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // q69: zone-map pruning is layout-only — the boxed aggregate over
    // the pruned z-ordered copy must equal the same box on the
    // original table
    "q69_zonemap_pruned_scan" ->
      """SELECT l_returnflag, count(*) AS n,
        |       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE l_partkey BETWEEN 10 AND 400 AND l_suppkey BETWEEN 1 AND 40
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // q70: skipping is a performance act — the oracle is the plain
    // full-scan aggregate over the same box
    "q70_zonemap_planned_scan" ->
      """SELECT l_returnflag, count(*) AS n,
        |       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE l_partkey BETWEEN 50 AND 300 AND l_suppkey BETWEEN 2 AND 30
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // q71/q72: bloom pruning is layout-only — the IN probe over the
    // pruned scattered copy must equal the same IN on the original
    // table, whether the skip happens in the driver path list (q71)
    // or inside the scan node's own file listing (q72)
    "q71_bloom_pruned_scan" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id IN (7, 233, 481) ORDER BY doc_id""".stripMargin,
    "q72_bloom_planned_scan" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id IN (7, 233, 481) ORDER BY doc_id""".stripMargin,

    // q73: dynamic partition pruning is a performance act — joining
    // the month-partitioned copy through the quarter-filtered dim
    // must equal the plain quarter predicate on the original table
    "q73_dpp_star_join" ->
      """SELECT l_returnflag, count(*) AS n,
        |       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE quarter(l_shipdate) = 2
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // q74: bucketing + sorted scan are layout-only — the co-located
    // merge join's aggregate must equal the plain join's
    "q74_bucket_sorted_join" ->
      """SELECT l_returnflag, o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q75: the rewritten file's live contents are the base rows with
    // l_partkey < 50 shifted by 100000 — a probe of the shifted band
    // must return exactly them, which it only can by REFUSING the
    // stale zone row (the pre-guard engine returned empty here)
    "q75_stale_rewrite_scan" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(l_partkey + 100000 AS BIGINT) AS l_partkey
        |FROM lineitem WHERE l_partkey < 50
        |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin,

    // q76: stacked skipping is layout-only — the composed zone+bloom
    // scan's answer must equal the plain mixed predicate
    "q76_composed_skipping" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
        |FROM lineitem
        |WHERE l_partkey BETWEEN 50 AND 1500
        |  AND l_orderkey IN (7, 388, 1123)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // q63: shard = value % 4 is a pure value function, so grouping by
    // it reproduces the disjoint per-shard distinct slices exactly
    "q63_sharded_collect_set" ->
      """SELECT event_type,
        |       CAST(user_id % 200 % 4 AS BIGINT) AS shard,
        |       array_to_string(list_sort(list(DISTINCT user_id % 200)), ',') AS uniq
        |FROM events
        |GROUP BY event_type, user_id % 200 % 4
        |ORDER BY event_type, shard""".stripMargin,

    // q64: the exact discrete quantile from the same cumulative walk
    // (integer arithmetic both engines reproduce); the sketch flag is
    // the within-alpha predicate, expected true. Positivity filter
    // mirrors the Spark side's DDSketch-domain precondition.
    "q64_sql_ddsketch" ->
      """WITH ev AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS value_c
        |            FROM events WHERE CAST(round(value*100) AS BIGINT) > 0),
        |qs AS (SELECT CAST(unnest([500000,950000,990000]) AS BIGINT) AS qe6),
        |g AS (SELECT event_type, value_c, count(*) AS cnt FROM ev GROUP BY 1, 2),
        |c AS (SELECT event_type, value_c, cnt,
        |             sum(cnt) OVER (PARTITION BY event_type ORDER BY value_c) AS cum,
        |             sum(cnt) OVER (PARTITION BY event_type) AS n
        |      FROM g)
        |SELECT event_type, qe6, CAST(max(n) AS BIGINT) AS n,
        |       CAST(min(CASE WHEN cum >= (n * qe6 + 999999) // 1000000
        |                     THEN value_c END) AS BIGINT) AS exact_c,
        |       CAST(1 AS BIGINT) AS within_rel
        |FROM c CROSS JOIN qs
        |GROUP BY event_type, qe6
        |ORDER BY event_type, qe6""".stripMargin,

    // q66: the plain left join IS the oracle, so the salted plan's
    // equivalence (nulls included, via the -1 bucket) is hash-gated
    "q66_salted_left_join" ->
      """SELECT CAST(COALESCE(o_custkey, -1) AS BIGINT) AS o_custkey,
        |       count(*) AS n_items,
        |       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c
        |FROM lineitem LEFT JOIN (SELECT o_orderkey, o_custkey FROM orders
        |                         WHERE o_orderkey % 3 = 0) o
        |  ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q65: q60's oracle arithmetic verbatim — the Spark side differs
    // only in surface (pure SQL over cm_bucket)
    "q65_sql_cm_estimate" ->
      """WITH ds AS (SELECT CAST(unnest([0,1,2,3]) AS BIGINT) AS d),
        |a AS (SELECT d, h % 65536 AS w, count(*) AS cnt_a FROM (
        |        SELECT ds.d,
        |               (('0x'||substr(md5('cm'||CAST(ds.d AS VARCHAR)||':'||CAST(l_orderkey AS VARCHAR)),1,15))::BIGINT) AS h
        |        FROM lineitem CROSS JOIN ds) GROUP BY 1, 2),
        |b AS (SELECT d, h % 65536 AS w, count(*) AS cnt_b FROM (
        |        SELECT ds.d,
        |               (('0x'||substr(md5('cm'||CAST(ds.d AS VARCHAR)||':'||CAST(o_orderkey AS VARCHAR)),1,15))::BIGINT) AS h
        |        FROM orders CROSS JOIN ds) GROUP BY 1, 2),
        |i AS (SELECT d, CAST(sum(cnt_a * cnt_b) AS BIGINT) AS inner_e
        |      FROM a JOIN b USING (d, w) GROUP BY 1)
        |SELECT d, inner_e FROM i
        |UNION ALL SELECT -1, CAST(min(inner_e) AS BIGINT) FROM i
        |UNION ALL SELECT -2, count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY d""".stripMargin
  )
}

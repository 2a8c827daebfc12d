package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Invariants of the round-6 training-pipeline queries (x28–x32, q31)
  * that the DuckDB hash gate can't express: plan shapes (the oracle
  * compares values, not exchanges) and algebraic properties that must
  * hold for ANY corpus, not just the fixture the hashes pin.
  */
class PipelineQueriesSpec extends AnyFunSuite with SparkTestSession {

  private val D = "/root/testdata/sf0.001"
  private def q(name: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, D)

  private def executedPlan(df: DataFrame): String = {
    df.count()
    df.queryExecution.executedPlan.toString
  }

  test("x28: benchmark side broadcast — the corpus never shuffles to meet it") {
    val plan = executedPlan(q("x28_contamination"))
    assert(!plan.contains("SortMergeJoin"),
      s"contamination join must broadcast the (small) benchmark side:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"both the overlap join and the totals join should be broadcasts:\n$plan")
  }

  test("x28: overlap never exceeds the benchmark doc's gram count") {
    val bad = q("x28_contamination")
      .filter(col("n_overlap") > col("bench_grams") ||
        col("contamination_e6") > 1000000L || col("n_overlap") < 1)
      .count()
    assert(bad === 0)
  }

  test("x29: bigram accounting ties out per document") {
    // n_bigrams = n_tokens - 1 (every ≥2-token doc), the top bigram is
    // one of them, and both fractions stay inside [0, 1e6]
    val bad = q("x29_repetition")
      .filter(col("n_bigrams") =!= col("n_tokens") - 1 ||
        col("top_bigram_cnt") > col("n_bigrams") ||
        col("n_distinct_bigrams") > col("n_bigrams") ||
        col("top_bigram_share_e6") > 1000000L ||
        col("dup_token_frac_e6") > 1000000L || col("dup_token_frac_e6") < 0L)
      .count()
    assert(bad === 0)
  }

  test("x30: every props payload has a numeric run; redaction shortens or keeps length") {
    val r = q("x30_pii_redact")
      .agg(min("n_num_runs").as("mn"), max("n_emails").as("me")).head()
    assert(r.getLong(0) >= 1L, "synthetic props always embed an integer")
    assert(r.getLong(1) === 0L, "corpus has no emails; the pattern must not misfire")
  }

  test("x31: chunks tile each document with stride 24 and cover every token") {
    val chunks = q("x31_chunk")
    val docs = spark.read.parquet(s"$D/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val agg = chunks.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"),
      max(col("chunk_start") + col("n_chunk_tokens")).as("covered_end"),
      max(col("chunk_start") % 24).as("stride_rem"),
      max("n_chunk_tokens").as("max_len"))
    val joined = agg.join(docs, "doc_id")
    assert(joined.filter(col("stride_rem") =!= 0L).count() === 0,
      "every chunk starts on a stride boundary")
    assert(joined.filter(col("max_len") > 32L).count() === 0,
      "no chunk exceeds the context width")
    assert(joined.filter(col("covered_end") =!= col("n_tokens")).count() === 0,
      "the last chunk must reach the document's final token")
    assert(joined.filter(
      col("n_chunks") =!= floor((col("n_tokens") - 1) / 24) + 1).count() === 0,
      "chunk count = floor((n-1)/stride)+1")
  }

  test("x32: per-doc top-k is bounded and score-ordered") {
    val t = q("x32_tfidf")
    assert(t.groupBy("doc_id").count().filter(col("count") > 3).count() === 0)
    // rnk order must agree with score order within each doc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("rnk")
    val bad = t.withColumn("prev", lag("score_e6", 1).over(w))
      .filter(col("prev").isNotNull && col("prev") < col("score_e6"))
      .count()
    assert(bad === 0)
  }

  test("x34: packing covers every chunk once and respects the budget+overflow bound") {
    val packed = q("x34_sequence_packing")
    val chunks = q("x31_chunk")
    // same chunk set as x31 (shuffling/packing reorders, never drops)
    assert(packed.count() === chunks.count())
    assert(packed.select("doc_id", "chunk_start").distinct().count() === chunks.count())
    // each packed sequence holds at most budget + the overflow chunk's
    // tail (a chunk is <= 32 tokens, so a straddler adds < 32)
    val bad = packed.groupBy("bucket", "seq_id")
      .agg(sum("n_chunk_tokens").as("seq_tokens"))
      .filter(col("seq_tokens") > 256L + 31L)
      .count()
    assert(bad === 0)
    // within a bucket the cumulative count is strictly increasing —
    // the deterministic packing order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy("cum_tokens")
    val nonMono = packed
      .withColumn("prev", lag("cum_tokens", 1).over(w))
      .filter(col("prev").isNotNull && col("prev") >= col("cum_tokens"))
      .count()
    assert(nonMono === 0)
  }

  test("q31: sampling is per-stratum and hits the configured rate band") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val sampled = graft.SparkEntry.queries("q31_stratified_sample")(
      spark, "/root/testdata/sf0.01")
    val totals = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    val kept = sampled.groupBy("lang").agg(count(lit(1)).as("k"))
    val fr = totals.join(kept, "lang")
      .select(col("lang"), (col("k") / col("n")).as("frac"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // deterministic given the fixture; band is wide enough to be
    // corpus-agnostic at n≈1000 per stratum
    assert(fr("en") > 0.35 && fr("en") < 0.65, s"en frac=${fr("en")}")
    assert(fr("fr") > 0.12 && fr("fr") < 0.40, s"fr frac=${fr("fr")}")
    val others = fr.view.filterKeys(k => k != "en" && k != "fr")
    assert(others.values.forall(v => v > 0.02 && v < 0.25), others.toMap.toString)
  }

  test("r05_mat: the materialized plan variant emits exactly r05's rows") {
    // r05_spike_pipeline_mat is bench-only (no separate oracle by
    // design: same ANSWER, different physical plan — caching cur/prev
    // halves the fact scans). This is its hash tie to the oracle'd
    // r05: row-for-row equality on the same input, both orderings
    // canonical. VERDICT r06 ask #8.
    val r05 = q("r05_spike_pipeline")
    val mat = graft.queries.ReferenceQueries.benchOnly("r05_spike_pipeline_mat")(spark, D)
    assert(r05.schema === mat.schema)
    assert(r05.exceptAll(mat).count() === 0 && mat.exceptAll(r05).count() === 0)
    assert(r05.count() === mat.count())
  }

  test("x68: splits partition the corpus and never straddle a near-dup cluster") {
    val split = q("x68_leakage_safe_split").cache()
    try {
      val docs = spark.read.parquet(s"$D/documents.parquet")
      // exactly one row per document
      assert(split.count() === docs.count())
      assert(split.select("doc_id").distinct().count() === docs.count())
      // a cluster representative maps to exactly one split
      val straddling = split.groupBy("rep")
        .agg(countDistinct(col("split")).as("n_splits"))
        .filter(col("n_splits") > 1).count()
      assert(straddling === 0)
      // and every near-dup candidate PAIR shares a split (the guarantee
      // stated doc-to-doc, independent of the rep encoding)
      // full listing: the leak check must see member-level pairs, not
      // just the star-collapsed cluster edges
      val pairs = graft.llm.Dedup.minhashCandidates(docs, "text", "doc_id",
        collapseExact = false)
      val sa = split.select(col("doc_id").as("doc_a"), col("split").as("s_a"))
      val sb = split.select(col("doc_id").as("doc_b"), col("split").as("s_b"))
      val leaked = pairs.join(sa, "doc_a").join(sb, "doc_b")
        .filter(col("s_a") =!= col("s_b")).count()
      assert(leaked === 0)
    } finally split.unpersist()
  }

  test("x74: every cluster's quota is respected with dense ranks and unique survivors") {
    val kept = q("x74_cluster_balanced_sample").cache()
    try {
      // survivors are unique documents spread over at most 8 clusters
      assert(kept.select("vec_id").distinct().count() === kept.count())
      assert(kept.select("cluster").distinct().count() <= 8)
      // per-cluster: at most Q=25 kept, ranks exactly 1..n (dense)
      val perCluster = kept.groupBy("cluster")
        .agg(count("*").as("n"), max("rk").as("mx"),
          countDistinct("rk").as("dr")).cache()
      val bad = perCluster
        .filter(col("n") > 25 || col("mx") =!= col("n") || col("dr") =!= col("n"))
        .count()
      assert(bad === 0, "quota overflow or non-dense ranks")
      // a cluster with >= Q members must keep EXACTLY Q (the cap binds,
      // it doesn't thin): recompute assignment sizes independently
      val emb = spark.read.parquet(s"$D/embeddings.parquet")
      assert(emb.count() > 8 * 25, "fixture large enough for the cap to bind")
      assert(perCluster.filter(col("n") === 25).count() >= 1,
        "at least one cluster must hit the cap on this corpus")
    } finally kept.unpersist()
  }

  test("x75: selection stays in the raw pool with dense ranks and non-increasing scores") {
    val top = q("x75_dsir_select").orderBy("rk").collect()
    assert(top.length === 100)
    // every selected doc is from the raw pool (never the target domain)
    assert(top.forall(r => r.getLong(0) % 11 != 0))
    // ranks dense 1..100, scores non-increasing along them
    assert(top.map(_.getLong(3)).toSeq === (1L to 100L))
    val scores = top.map(_.getLong(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("x75: scoring fuses into the scan — literal weights, no join") {
    val docs = graft.queries.Tables.documents(spark, D)
    val w = graft.llm.Selection.importanceWeights(docs, col("doc_id") % 11 === 0)
    // weight table is the fixed-size artifact the design promises
    assert(w.length === 4096)
    val scored = graft.llm.Selection.importanceScores(
      docs.filter(col("doc_id") % 11 =!= 0), w)
    val plan = executedPlan(scored)
    assert(!plan.contains("Join"), s"scoring must not join:\n$plan")
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
    // and the full query's top-100 is the bounded take, not a global sort
    val full = executedPlan(q("x75_dsir_select"))
    assert(full.contains("TakeOrderedAndProject"),
      s"top-k must be per-partition take + driver merge:\n$full")
  }

  test("x76: token accounting ties out and a removed span implies a cross-doc gram") {
    val scrub = q("x76_dup_span_scrub").cache()
    try {
      val docs = spark.read.parquet(s"$D/documents.parquet")
      assert(scrub.count() === docs.count(), "every doc must survive as a row")
      // n_tokens - n_removed = tokens actually present in the rewrite
      val bad = scrub.filter(
        col("n_removed") < 0 || col("n_removed") > col("n_tokens") ||
          (when(col("text_scrubbed") === "", lit(0L))
            .otherwise(size(split(col("text_scrubbed"), " ")).cast("long"))
            =!= col("n_tokens") - col("n_removed"))).count()
      assert(bad === 0, "token accounting broken")
      // the corpus is template-generated: some spans must actually scrub
      assert(scrub.filter(col("n_removed") > 0).count() >= 1)
      // kept text is a sub-multiset of the original tokens
      val joined = scrub.filter(col("text_scrubbed") =!= "")
        .join(docs.select("doc_id", "text"), "doc_id")
        .filter(!expr(
          "forall(split(text_scrubbed, ' '), tk -> array_contains(split(text, ' '), tk))"))
        .count()
      assert(joined === 0, "rewrite invented a token")
    } finally scrub.unpersist()
  }

  test("x77: the tau-estimator is well-formed and lands near the true total") {
    val sample = q("x77_priority_sample").orderBy("rk").collect()
    assert(sample.length === 48)
    assert(sample.map(_.getLong(3)).toSeq === (1L to 48L), "ranks dense")
    val prios = sample.map(_.getLong(2))
    assert(prios.zip(prios.tail).forall { case (a, b) => a >= b },
      "priorities non-increasing along rank")
    // est = max(w, tau): never below the doc's own weight, and every
    // kept priority clears the threshold
    val tau = sample.map(r => r.getLong(4) max r.getLong(1)).min
    assert(sample.forall(r => r.getLong(4) >= r.getLong(1)))
    assert(prios.forall(_ >= tau), "a kept priority below tau would be unsampled")
    // the POINT of DLT: sum(est) over 48 docs estimates sum(w) over all
    val truth = spark.read.parquet(s"$D/documents.parquet")
      .agg(sum("n_chars")).head().getLong(0)
    val est = sample.map(_.getLong(4)).sum
    assert(est > truth * 7 / 10 && est < truth * 13 / 10,
      s"estimator off: est=$est truth=$truth")
    // the 49-row take materializes once (TakeOrderedAndProject inside
    // the eager checkpoint); the final plan is window + broadcast τ
    // join over those 49 rows and must never rescan the corpus
    val plan = executedPlan(q("x77_priority_sample"))
    assert(!plan.contains("Scan parquet"), s"corpus must not rescan:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"τ join must broadcast:\n$plan")
  }

  test("x78: the scrubbed corpus carries zero benchmark 5-grams") {
    val scrub = q("x78_decontaminate").cache()
    try {
      val docs = spark.read.parquet(s"$D/documents.parquet")
      val nBench = docs.filter(col("doc_id") % 97 === 0).count()
      // benchmark docs are excluded; every training doc survives as a row
      assert(scrub.count() === docs.count() - nBench)
      assert(scrub.filter(col("doc_id") % 97 === 0).count() === 0)
      // the audit (x28) found contamination, so the scrub must bite
      assert(scrub.filter(col("n_removed") > 0).count() >= 1)
      // THE decontamination guarantee: re-shingle the rewritten text
      // and intersect with the benchmark's 5-gram set — empty
      val benchGrams = docs.filter(col("doc_id") % 97 === 0)
        .select(explode(graft.llm.TextFunctions.wordShingles(
          graft.llm.TextFunctions.tokens(col("text")), 5)).as("g"))
        .distinct()
      val residual = scrub.filter(col("text_scrubbed") =!= "")
        .select(explode(graft.llm.TextFunctions.wordShingles(
          split(col("text_scrubbed"), " "), 5)).as("g"))
        .join(benchGrams, "g").count()
      assert(residual === 0, s"$residual benchmark grams survive the scrub")
    } finally scrub.unpersist()
  }

  test("x79: waterfilling saturates small-capacity sources and respects the budget") {
    val kept = q("x79_budget_mixture").cache()
    try {
      val allocs = kept.select("source", "alloc", "saturated").distinct().cache()
      // the four high-weight sources can't absorb their 12k share of
      // the 60k budget (each holds ~8k chars) — they must saturate
      val sat = allocs.filter(col("saturated") === 1L).collect()
      assert(sat.map(_.getString(0)).sorted.toSeq ===
        Seq("src0", "src1", "src2", "src3"))
      // a saturated source's allocation is its full capacity
      val caps = spark.read.parquet(s"$D/documents.parquet")
        .groupBy("source").agg(sum("n_chars").as("t"))
      val bad = allocs.filter(col("saturated") === 1L)
        .join(caps, "source").filter(col("alloc") =!= col("t")).count()
      assert(bad === 0)
      // total allocation spends (almost) the budget, never exceeds it
      val total = allocs.agg(sum("alloc")).head().getLong(0)
      assert(total <= 60000L && total > 59000L, s"allocation total $total")
      // redistribution: unsaturated sources share the saturated
      // shortfall equally (equal weights) and beat the naive pro-rata
      // share of 12500*60000/1e6 = 750
      val unsat = allocs.filter(col("saturated") === 0L)
        .select("alloc").distinct().collect()
      assert(unsat.length === 1, "equal weights must yield equal shares")
      assert(unsat.head.getLong(0) > 750L, "no shortfall redistributed")
      // the apply pass never overdraws a source
      val over = kept.groupBy("source")
        .agg(sum("n_chars").as("used"), max("alloc").as("a"))
        .filter(col("used") > col("a")).count()
      assert(over === 0)
    } finally kept.unpersist()
  }

  test("x80: every prefix of the interleave respects the mixture") {
    val order = q("x80_weighted_interleave").orderBy("pos").collect()
    val docs = spark.read.parquet(s"$D/documents.parquet")
    assert(order.length === docs.count())
    // positions are a dense permutation
    assert(order.map(_.getLong(4)).toSeq === (1L to order.length))
    // the WFQ guarantee at the sharpest prefix: high-weight steps are
    // 5e6 of virtual time, low-weight 8e7, so every position before
    // vt 8e7 belongs to the four 0.2-weight sources — 15 docs each
    val head = order.takeWhile(_.getLong(3) < 80000000L)
    assert(head.length === 60, s"vt<8e7 prefix is ${head.length}")
    val bySrc = head.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySrc.keySet === Set("src0", "src1", "src2", "src3"))
    assert(bySrc.values.forall(_ === 15), bySrc.toString)
    // and within each source the order follows its own k sequence
    val outOfOrder = order.groupBy(_.getString(1)).values.map { rows =>
      val ks = rows.sortBy(_.getLong(4)).map(_.getLong(2)).toSeq
      if (ks === (1L to ks.length)) 0 else 1
    }.sum
    assert(outOfOrder === 0, "a source's docs must appear in its k order")
  }

  test("x81: FIM segments reassemble to the original text, pass-through verbatim") {
    val docs = spark.read.parquet(s"$D/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"))
    val joined = q("x81_fim_transform").join(docs, "doc_id").collect()
    assert(joined.nonEmpty)
    var fimCount = 0
    joined.foreach { r =>
      val (fim, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (out, text, n) = (r.getString(4), r.getAs[String]("text"),
        r.getAs[Long]("n_chars"))
      if (fim == 0L) {
        assert(out === text, s"non-FIM doc ${r.getLong(0)} must pass through")
        assert(lo === -1L && hi === -1L)
      } else {
        fimCount += 1
        assert(0L <= lo && lo <= hi && hi <= n, s"cuts out of range: $lo/$hi/$n")
        // PSM: <PRE>prefix<SUF>suffix<MID>middle — reassembly is exact
        val pre = out.indexOf("<PRE>"); val suf = out.indexOf("<SUF>")
        val mid = out.indexOf("<MID>")
        assert(pre === 0 && suf >= 5 && mid > suf)
        val prefix = out.substring(5, suf)
        val suffix = out.substring(suf + 5, mid)
        val middle = out.substring(mid + 5)
        assert(prefix + middle + suffix === text,
          s"doc ${r.getLong(0)}: segments must reassemble")
        assert(prefix.length === lo && middle.length === hi - lo)
      }
    }
    // the hash rate draw should sit near the paper's 50% FIM rate
    assert(fimCount > joined.length / 3 && fimCount < 2 * joined.length / 3,
      s"FIM rate drifted: $fimCount of ${joined.length}")
  }

  test("x82: every doc appears n_full or n_full+1 times; spend is within one doc of target") {
    val out = q("x82_epoch_mixture").cache()
    try {
      val docs = spark.read.parquet(s"$D/documents.parquet")
      val stats = docs.groupBy("source")
        .agg(sum("n_chars").cast("long").as("t"), max("n_chars").as("maxDoc"))
        .withColumn("w_e6",
          when(expr("CAST(substring(source, 4, 10) AS BIGINT)") < 4,
            lit(200000L)).otherwise(lit(12500L)))
        .withColumn("target", expr("(3000000 * w_e6) DIV 1000000"))
        .withColumn("n_full", expr("target DIV t"))
        .collect().map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("target"), r.getAs[Long]("n_full"),
            r.getAs[Long]("maxDoc"))).toMap
      // per-doc copy counts are dense 1..c with c in {n_full, n_full+1}
      val perDoc = out.groupBy("source", "doc_id")
        .agg(count(lit(1)).as("c"), max("copy").as("maxCopy")).collect()
      perDoc.foreach { r =>
        val nf = stats(r.getString(0))._2
        assert(r.getLong(2) === r.getLong(3), "copies must be dense from 1")
        assert(r.getLong(2) === nf || r.getLong(2) === nf + 1,
          s"${r.getString(0)}/${r.getLong(1)}: ${r.getLong(2)} copies vs n_full=$nf")
      }
      // per-source spend: never over target, within one max doc under
      out.groupBy("source").agg(sum("n_chars").as("spent")).collect()
        .foreach { r =>
          val (target, _, maxDoc) = stats(r.getString(0))
          val spent = r.getLong(1)
          assert(spent <= target, s"${r.getString(0)} overspent: $spent > $target")
          assert(spent > target - maxDoc,
            s"${r.getString(0)} underspent: $spent vs target $target (maxDoc $maxDoc)")
        }
    } finally out.unpersist()
  }

  test("x83: map-only plan, counters tie out, flags non-degenerate") {
    val df = q("x83_gopher_rules").cache()
    try {
      val plan = executedPlan(df)
      assert(!plan.contains("Join"), s"quality rules must not join:\n$plan")
      val bad = df.filter(
        col("alpha_words") > col("n_words") ||
          col("ellipsis_words") > col("n_words") ||
          col("stop_hits") > 8L || col("stop_hits") < 0L ||
          col("pass") =!= col("r_word_count") * col("r_mean_word_len") *
            col("r_alpha_ratio") * col("r_ellipsis") * col("r_stopwords"))
        .count()
      assert(bad === 0)
      // the composite must actually discriminate on this corpus
      val passes = df.filter(col("pass") === 1L).count()
      assert(passes > 0 && passes < df.count(),
        s"degenerate pass rate: $passes of ${df.count()}")
    } finally df.unpersist()
  }

  test("x85: tertiles are balanced per source and ordered by fluency") {
    val df = q("x85_perplexity_split").cache()
    try {
      // within every source, tier sizes differ by at most 1 (the
      // DIV-cut guarantee) and every scored doc has a tier in 0..2
      val sizes = df.groupBy("source", "tier").count()
        .groupBy("source")
        .agg(max("count").as("mx"), min("count").as("mn"),
          countDistinct("tier").as("nt"))
        .filter(col("mx") - col("mn") > 1 || col("nt") =!= 3)
        .count()
      assert(sizes === 0, "unbalanced or missing tertiles")
      // tier 0 (head) is the most fluent: its minimum LM score is >=
      // tier 2's maximum within every source
      val inverted = df.groupBy("source").agg(
          min(when(col("tier") === 0, col("mean_p_e6"))).as("head_min"),
          max(when(col("tier") === 2, col("mean_p_e6"))).as("tail_max"))
        .filter(col("head_min") < col("tail_max")).count()
      assert(inverted === 0, "head tier scored below tail tier")
    } finally df.unpersist()
  }

  test("x74: assignment fuses into the scan — no join, no ranking window") {
    val plan = executedPlan(q("x74_cluster_balanced_sample"))
    // the collected-literal coarse quantizer means NO join of any kind:
    // centroids ride in the projection as literal arrays
    assert(!plan.contains("Join"), s"assignment must not join:\n$plan")
    // the quota runs through the bounded typed aggregate (state |clusters|*Q
    // before the exchange), not a corpus-wide ranking window
    assert(plan.contains("ObjectHashAggregate"),
      s"quota must use the bounded top-k aggregate:\n$plan")
    assert(!plan.contains("Window"), s"no corpus-wide ranking window:\n$plan")
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints one JSON line (driver contract → BENCH_r{N}.json).
  *
  * Two failure modes of earlier rounds drive the design:
  *
  *   - BENCH_r05 hit the driver's wall-clock limit (rc=124): a fixed
  *     3-iterations-plus-full-warmup schedule multiplies co-tenant
  *     contention by 4× on every heavy query. Iterations are now
  *     ADAPTIVE: a query whose first timed run exceeds [[HeavySecs]]
  *     is recorded from that run alone (its cost dwarfs the codegen
  *     noise extra iterations exist to smooth), cheap queries still
  *     get [[Iters]] runs and a median. A global [[BudgetSecs]] stops
  *     extra iterations (never first runs) once the bench has been
  *     running too long, so the JSON line ALWAYS appears.
  *
  *   - BENCH_r03/r05 arrived with parsed:null — the driver captures a
  *     bounded log tail, and a 4.5 KB JSON line with three embedded
  *     maps got truncated. The stdout line now carries only the
  *     driver-contract fields with 3-decimal values and is printed
  *     LAST; the full document (mins, per-query iteration counts,
  *     errors) goes to target/bench.json, whose path is announced
  *     BEFORE the JSON line.
  */
object Bench {

  private val Iters = 3
  private val HeavySecs = 4.0

  /** Entries pinned to ≥ [[Iters]] samples even in the sentinel-gated
    * heavy-ish branch (VERDICT r9 ask #3): x26 straddles the 1 s gate
    * — a single contended draw pushed it over in r9 and the one-sample
    * fast path then REPORTED that draw. Pinning re-draws until Iters
    * samples exist, so the reported min is a plan cost, not a burst.
    */
  private val PinnedIters = Set("x26_simhash_neardup",
    // x71 regressed 0.50→0.77 in r10's single-sample branch — the same
    // straddle-the-gate shape as x26 (VERDICT r10 ask #4): re-draw to
    // Iters samples so the reported min is a plan cost, not one burst
    "x71_source_overlap_sketch",
    // the r11 idle run's three >1.4× movers (st17 1.3→1.9, r05
    // 0.42→0.98, x85 0.57→1.07) are the same midband-straddler shape
    // with UNCHANGED plans (PlanAudit clean) — pin them so the
    // reported min draws from Iters samples, not two
    "st17_streaming_cdc_merge", "r05_spike_pipeline_mat",
    "x85_perplexity_split",
    // r12's control draw flagged x43 at 0.85→1.68 s with the plan
    // unchanged and a fresh idle re-draw at 1.28 s — the same
    // midband-straddler shape; pin it to Iters samples
    "x43_ivfpq_residual_topk")
  // 1200 since round 14: at 213 entries the idle full run's wall is
  // ~770 s, so the old 900 s budget left the alphabet's tail (the
  // x-block) no re-draw capacity — its >1 s entries fell to SINGLE
  // samples exactly when a burst hit them (x86/x87/x89 drew once at
  // 5–29× in an otherwise median-1.06× window). The driver's own
  // wall limit is far above this; the JSON line still always appears
  // (the budget gates EXTRA iterations, never first runs).
  private val BudgetSecs = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "1200").toDouble

  /** Queries above this first-run cost get a contention check: a fixed
    * trivial sentinel job timed right after the sample. An inflated
    * sentinel means a co-tenant burst overlapped the run (BENCH_r07
    * reported x60–x62 at 7–16× their idle cost despite best-of-3 —
    * VERDICT r7 ask #3), so the sample is re-drawn while the budget
    * holds; a sample whose sentinel reads clean is trusted. Cheap
    * queries skip the check — their median-of-3 already smooths noise
    * and the sentinel would double their cost.
    */
  private val SentinelGateSecs = 1.0
  private val SentinelInflation = 3.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession
      .configure(SparkSession.builder(), shufflePartitions = cpus.toInt)
      .master(s"local[$cpus]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.Tables.validate(spark, sfDir)
    val bench0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - bench0) / 1e9

    // Micro-batch execution time accumulated across every streaming
    // query the current registry entry starts (durationMs is the
    // engine's own per-trigger breakdown): wall − exec = the fixed
    // MemoryStream feed/setup harness floor, reported per st* entry so
    // a state-management regression is visible above that floor
    // (VERDICT r7 ask #7 — st15's 5.1 s is mostly harness).
    val stExecMs = new java.util.concurrent.atomic.AtomicLong
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        stExecMs.addAndGet(
          Option(e.progress.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L))
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    // listener delivery is async on the event bus — after a streaming
    // entry returns, wait for the counter to go quiet before reading
    // it (bounded; non-streaming entries never enter the loop)
    def settledExecMs(prev: Long): Long = {
      var last = stExecMs.get()
      if (last != prev) {
        var quiet = 0
        while (quiet < 3) {
          Thread.sleep(50)
          val now = stExecMs.get()
          if (now == last) quiet += 1 else { last = now; quiet = 0 }
        }
      }
      last
    }

    // The contention sentinel: a fixed range→agg job whose idle cost
    // is stable (~0.1 s); its floor is the min of 5 runs up front.
    def sentinelSecs(): Double = {
      val t0 = System.nanoTime()
      spark.range(2000000L).selectExpr("id % 97 AS k")
        .groupBy("k").count().count()
      (System.nanoTime() - t0) / 1e9
    }

    // Bench set = the oracle queries plus bench-only plan variants
    // (e.g. the materialized spike pipeline, the path a real deployment
    // runs — SpikeDetector.detect(materialize = true)).
    // SPARK_GRAFT_BENCH_ONLY=<comma-list of name prefixes> narrows the
    // run for targeted re-measurement (dev-side; the driver runs full)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val queries0 = SparkEntry.queries ++ graft.queries.ReferenceQueries.benchOnly
    val queries = only match {
      case Some(ps) => queries0.filter { case (n, _) => ps.exists(n.startsWith) }
      case None => queries0
    }

    // Warm the JVM + each table's first scan with a handful of CHEAP
    // queries (classloading, codegen framework, parquet footers). A
    // full warmup pass re-ran every heavy/streaming query once before
    // timing even began — half of r05's budget gone before the first
    // measurement.
    Seq("r01_scan_filter_project", "q01_tpch_q1", "x04_token_stats",
        "x10_cosine_topk").foreach { n =>
      queries.get(n).foreach { fn =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
    }
    spark.catalog.clearCache()

    // ---- committed same-host control draw (VERDICT r12 ask #6) ----
    // tools/bench.sh --control benches the PREVIOUS round's tree and
    // this tree minutes apart on one host and commits the control
    // summary as BENCH_CONTROL.json; merging it below puts the control
    // + per-query mover verdicts into the driver-submitted artifact
    // itself. Parsed HERE, before timing, because the control's
    // recorded sentinel floor also gates the RUN (ask r13 #2).
    // Flat regex parse (no JSON lib on the classpath); the file is
    // generated by tools/bench.sh in exactly this shape.
    case class Control(sha: String, sf: String, total: Double,
                       floor: Option[Double], mins: Map[String, Double])
    val control: Option[Control] = {
      val p = java.nio.file.Paths.get("BENCH_CONTROL.json")
      if (!java.nio.file.Files.isReadable(p)) None
      else scala.util.Try {
        val txt = java.nio.file.Files.readString(p)
        def str(k: String) = (s""""$k"\\s*:\\s*"([^"]+)"""").r
          .findFirstMatchIn(txt).get.group(1)
        val tot = """"total"\s*:\s*([0-9.]+)""".r
          .findFirstMatchIn(txt).get.group(1).toDouble
        // optional: controls committed before round 14 lack it
        val floor = """"sentinel_floor"\s*:\s*([0-9.]+)""".r
          .findFirstMatchIn(txt).map(_.group(1).toDouble)
        val minsBlock = txt.split("\"queries_min\"\\s*:\\s*\\{", 2)(1)
          .split("\\}", 2)(0)
        val mins = """"([^"]+)"\s*:\s*([0-9.]+)""".r.findAllMatchIn(minsBlock)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
        Control(str("sha"), str("sf"), tot, floor, mins)
      }.toOption
    }
    // only comparable at the control's own scale factor (basename —
    // the driver and dev runs mount the same /root/testdata dirs)
    val usableControl = control.filter(c =>
      new java.io.File(c.sf).getName == new java.io.File(sfDir).getName)

    // The per-entry sentinel gate below compares against the run's OWN
    // floor, which a UNIFORMLY loaded window inflates into silence
    // (BENCH_r13: floor 0.505 vs the control draw's 0.175, every entry
    // "clean"). With a control floor in hand, gate the RUN: re-draw
    // the floor while it reads hot (the burst may pass), then stamp
    // the artifact contended_run so phantom movers are self-labeled.
    val controlFloor = usableControl.flatMap(_.floor)
    var sentinelFloor = (1 to 5).map(_ => sentinelSecs()).min
    var floorRetries = 0
    while (BenchGuards.contendedRun(sentinelFloor, controlFloor) &&
        floorRetries < 2) {
      println(s"bench: sentinel floor ${sentinelFloor}s reads hot vs control " +
        s"${controlFloor.get}s — pausing 15s and re-drawing")
      Thread.sleep(15000)
      sentinelFloor = math.min(sentinelFloor,
        (1 to 5).map(_ => sentinelSecs()).min)
      floorRetries += 1
    }
    val contendedRun = BenchGuards.contendedRun(sentinelFloor, controlFloor)

    // per-entry samples, KEYED so a mid-run-burst re-draw can merge
    // more samples into an already-recorded entry (VERDICT r14 ask
    // #2); (samples, stat) where stat=true reports the median (cheap
    // entries), stat=false the min (sentinel-gated heavies)
    val samplesByName = scala.collection.mutable.LinkedHashMap
      .empty[String, (List[(Double, Double)], Boolean)]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val contended = scala.collection.mutable.LinkedHashSet.empty[String]
    // the mid-run burst tracker (ask r14 #2): every sentinel reading —
    // the heavy branch's own gates plus a forced reading at least
    // every 4 completed entries — vouches for or marks the window of
    // entries since the last clean reading; suspects are re-drawn
    // (budget permitting) or stamped into `contended`, so a burst
    // arriving between the run-level floor draw and the tail can no
    // longer inflate sub-threshold entries silently (x75 shipped at
    // 27.5 s vs a 2.58 s clean min in BENCH_r14 exactly that way)
    val tracker = new BenchGuards.BurstTracker(sentinelFloor)

    // (wall seconds, streaming exec seconds) — exec is 0 for batch
    def runOnce(name: String,
                fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Option[(Double, Double)] = {
      val exec0 = stExecMs.get()
      val t0 = System.nanoTime()
      val r =
        try {
          fn(spark, sfDir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          Some((wall, (settledExecMs(exec0) - exec0) / 1000.0))
        }
        catch { case e: Throwable =>
          // keyed map, not appended pairs: a query failing every
          // iteration must not emit duplicate JSON keys
          errors.getOrElseUpdate(name,
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
          None
        }
      // a materializing query must re-pay its cache each iteration,
      // or iterations 2..n measure an already-cached no-op plan
      spark.catalog.clearCache()
      r
    }
    def addSamples(name: String, more: Seq[(Double, Double)],
                   stat: Boolean): Unit =
      samplesByName.get(name) match {
        case Some((old, st)) => samplesByName(name) = (old ++ more, st)
        case None => samplesByName(name) = (more.toList, stat)
      }
    // a hot window's suspects: one merged re-draw each while the
    // budget holds, and a contended stamp when the re-draw window is
    // itself still hot (or the budget is gone) — the entry is then
    // self-labeled noise in the artifact instead of a phantom mover.
    // Every re-drawn entry is FLIPPED to min reporting (ADVICE r15):
    // for a stat=true (median-reported) entry the merged clean sample
    // only repaired queries_min while the REPORTED median stayed
    // inflated by the burst window's samples and escaped the stamp —
    // min is the one statistic the vouched-clean re-draw repairs.
    def handleSuspects(suspects: Seq[String]): Unit = {
      val sus = suspects.distinct.filter(samplesByName.contains)
      if (sus.isEmpty) return
      if (elapsed > BudgetSecs) { contended ++= sus; return }
      println(s"bench: mid-run burst over ${sus.mkString(",")} — re-drawing")
      sus.foreach { n =>
        if (elapsed <= BudgetSecs)
          queries.get(n).foreach { fn =>
            runOnce(n, fn).foreach(smp => addSamples(n, Seq(smp), stat = false))
            samplesByName.get(n).foreach { case (ss, _) =>
              samplesByName(n) = (ss, false)
            }
          }
      }
      val post = sentinelSecs()
      if (BenchGuards.hot(post, sentinelFloor)) contended ++= sus
      tracker.observed(post)
      ()
    }

    queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      def once(): Option[(Double, Double)] = runOnce(name, fn)
      once() match {
        case None => () // recorded in errors
        case Some(s1) if elapsed > BudgetSecs =>
          addSamples(name, Seq(s1), stat = false)
          if (tracker.ran(name)) handleSuspects(tracker.observed(sentinelSecs()))
        case Some(s1) if s1._1 > SentinelGateSecs =>
          // heavy-ish: sentinel-gated best-of-N (VERDICT r7 ask #3).
          // The sentinel is timed right after the sample; an inflated
          // reading means a co-tenant burst overlapped the run, so the
          // sample is re-drawn (up to 2 extra, budget-capped, the same
          // caps as r7's unconditional best-of-3 for the >4 s tail).
          // The MIN is reported — the plan's cost, not the contention
          // draw; if every sample's sentinel was hot the entry is
          // listed in `contended` so the judge can discount it.
          var samples = List(s1)
          var sent = sentinelSecs()
          val caps = Iterator(BudgetSecs / 2, BudgetSecs * 3 / 4)
          // re-draw while the sentinel reads hot, and unconditionally
          // for the >HeavySecs tail (r7's best-of-3 — a burst can end
          // before the sentinel runs, so a clean reading alone must
          // not exempt a heavy sample)
          // min-of-2 floor for the 1–4 s band (VERDICT r9 ask #2): the
          // first execution of a plan carries its one-time query
          // compilation — for the big codegen'd retrieval stages
          // (x38/x52/x57) that is ~1 s, which r7's median-of-3
          // amortized and r8's single-sample branch then REPORTED,
          // reading as a 2× "drift" with the plan unchanged. One warm
          // re-run per midband entry buys back the steady-state cost;
          // the >4 s tail already re-draws unconditionally.
          def needMore: Boolean =
            sent > sentinelFloor * SentinelInflation ||
              samples.map(_._1).min > HeavySecs ||
              samples.size < 2 ||
              (PinnedIters(name) && samples.size < Iters)
          while (needMore && caps.hasNext) {
            if (elapsed < caps.next()) {
              once().foreach(s => samples ::= s)
              sent = sentinelSecs()
            }
          }
          if (sent > sentinelFloor * SentinelInflation) contended += name
          addSamples(name, samples, stat = false)
          // the branch's own final reading doubles as the window's
          // (resets the span; a hot reading marks this entry too)
          tracker.ran(name)
          handleSuspects(tracker.observed(sent))
        case Some(s1) =>
          val runs = s1 +: (2 to Iters).flatMap(_ => once())
          addSamples(name, runs, stat = true)
          if (tracker.ran(name)) handleSuspects(tracker.observed(sentinelSecs()))
      }
    }
    // tail flush: the last window may not have reached the span
    handleSuspects(tracker.observed(sentinelSecs()))

    val timings = Seq.newBuilder[(String, Double, Double, Int)]
    val stSplit = Seq.newBuilder[(String, Double, Double)] // (name, execSec, harnessSec)
    samplesByName.foreach { case (name, (samples, stat)) =>
      val walls = samples.map(_._1)
      val best = samples.minBy(_._1)
      val value = if (stat) walls.sorted.apply(walls.size / 2) else walls.min
      timings += ((name, value, walls.min, samples.size))
      if (best._2 > 0.0)
        stSplit += ((name, best._2, math.max(0.0, best._1 - best._2)))
    }

    // Spark exception messages are routinely multi-line — raw \n inside
    // a JSON string breaks the driver's parse exactly when the error
    // report matters, so escape every control char, not just \ and ".
    def jstr(s: String): String = {
      val b = new StringBuilder("\"")
      s.foreach {
        case '\\' => b.append("\\\\")
        case '"' => b.append("\\\"")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
        case c => b.append(c)
      }
      b.append("\"").toString
    }
    // Locale.ROOT: the f-interpolator honors the JVM default locale,
    // and a comma-decimal locale would emit invalid JSON numbers —
    // recreating the parsed:null failure this file exists to prevent
    def n3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f",
      java.lang.Double.valueOf(v))
    val ts = timings.result()
    val qs = ts.map { case (k, med, _, _) => jstr(k) + ":" + n3(med) }.mkString("{", ",", "}")
    // per-query min and iteration count: on a noisy shared host a
    // co-tenant burst can swallow a whole query — min vs median tells
    // a contention spike apart from a plan regression, and iters=1
    // marks the adaptively single-sampled heavy tail
    val qmin = ts.map { case (k, _, mn, _) => jstr(k) + ":" + n3(mn) }.mkString("{", ",", "}")
    val qit = ts.map { case (k, _, _, it) => jstr(k) + ":" + it }.mkString("{", ",", "}")
    val es = errors.toSeq.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = ts.map(_._2).sum
    val cont = contended.toSeq.map(jstr).mkString("[", ",", "]")
    // streaming entries: engine micro-batch execution vs fixed
    // MemoryStream feed/setup harness floor (wall = exec + harness) —
    // a state regression must show in exec, not hide under the floor
    val split = stSplit.result().map { case (k, ex, h) =>
      jstr(k) + s""":{"exec":${n3(ex)},"harness":${n3(h)}}"""
    }.mkString("{", ",", "}")
    val note = "adaptive iters: median of " + Iters +
      " for cheap queries; >" + SentinelGateSecs.toInt +
      "s runs are sentinel-gated best-of-<=3; mid-run sentinel windows " +
      "(every <=4 entries) re-draw or flag entries a burst overlapped " +
      "(re-drawn entries flip to min reporting so the burst window's " +
      "samples cannot inflate a median) " +
      "(entries in `contended` never saw a clean sentinel and are inflated " +
      "by co-tenant load; sentinel floor " +
      n3(sentinelFloor) + "s); past the " + BudgetSecs.toInt +
      "s budget, single runs; st* wall = streaming_split exec + fixed harness floor" +
      (if (contendedRun) "; CONTENDED_RUN: this run's sentinel floor is >" +
        BenchGuards.FloorInflation + "x the control draw's (" +
        controlFloor.map(n3).getOrElse("?") + "s) even after re-draws — the " +
        "whole window was loaded, every wall here is uniformly inflated, and " +
        "apparent regressions vs the control are noise, not plan changes"
       else "")
    // mover verdicts vs the committed control, on per-query MINs (the
    // plan's cost, not the contention draw) — same 1.3×/0.77×
    // thresholds as tools/bench.sh
    val controlJson: String = usableControl.map { c =>
      val minByName = ts.map { case (k, _, mn, _) => k -> mn }.toMap
      val movers = minByName.toSeq.sorted.flatMap { case (k, v) =>
        c.mins.get(k).filter(_ > 0).flatMap { w =>
          val ratio = v / w
          if (ratio > 1.3 || ratio < 0.77)
            Some(jstr(k) + s""":{"current_min":${n3(v)},"control_min":${n3(w)},"ratio":${n3(ratio)},"verdict":${jstr(if (ratio > 1.3) "regression" else "improvement")}}""")
          else None
        }
      }
      s""","control":{"sha":${jstr(c.sha)},"total":${n3(c.total)},"note":"same-host control draw of the previous round's tree (tools/bench.sh --control; BENCH_CONTROL.json commit), benched minutes apart from this tree's BENCH_LOCAL draw; movers compare this run's per-query mins against it"},"movers":${movers.mkString("{", ",", "}")}"""
    }.getOrElse("")
    val core = s"""{"metric":"total","value":${n3(total)},"unit":"sec","stat":"median","contended_run":$contendedRun,"note":${jstr(note)},"contended":$cont$controlJson,"queries":$qs,"sf":"$sfDir"}"""
    val full = s"""{"metric":"total","value":${n3(total)},"unit":"sec","stat":"median","contended_run":$contendedRun,"note":${jstr(note)},"bench_wall_sec":${n3(elapsed)},"sentinel_floor_sec":${n3(sentinelFloor)},"contended":$cont$controlJson,"streaming_split":$split,"queries":$qs,"queries_min":$qmin,"queries_iters":$qit,"errors":$es,"sf":"$sfDir"}"""
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, full.getBytes("UTF-8"))
    println(s"bench json written to ${out.toAbsolutePath}")
    if (errors.nonEmpty)
      println(s"bench errors (${errors.size}): ${errors.keys.mkString(",")} — details in target/bench.json")
    // BENCH_r08 still arrived parsed:null — at 170 registry entries
    // even the "compact" per-query line is ~4.5 KB and overflows the
    // driver's ~2000-char tail window (VERDICT r8 ask #3). Print the
    // full per-query line first, then a LAST line small enough to land
    // whole in any tail capture: totals, error/contention counts, and
    // the 8 heaviest entries as its `queries` map (the full map is the
    // line above and target/bench.json).
    println(core)
    val worst = ts.sortBy(-_._2).take(8)
      .map { case (k, med, _, _) => jstr(k) + ":" + n3(med) }.mkString("{", ",", "}")
    val tailNote = "compact tail line: `queries` here = 8 heaviest of " +
      ts.size + " entries; full per-query map on the previous stdout line and in target/bench.json"
    val ctlTail = usableControl.map(c =>
      s""","control_sha":${jstr(c.sha)},"control_total":${n3(c.total)}""").getOrElse("")
    println(s"""{"metric":"total","value":${n3(total)},"unit":"sec","stat":"median","entries":${ts.size},"errors":${errors.size},"contended_run":$contendedRun,"contended":$cont$ctlTail,"note":${jstr(tailNote)},"queries":$worst,"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.operators.{FileBloom, ZoneMap}
import graft.sources.IndexAdvisor.Indexes

/** Stacked planning-time indexes ([[IndexAdvisor]]): one scan node
  * whose listing carries BOTH the zone map's range verdict and the
  * bloom index's key verdict. The composition must (a) open at most
  * what EITHER index alone allows — and strictly fewer on a layout
  * built to show the intersection, (b) never change an answer,
  * (c) keep the predicate pushed, and (d) compose conservatism: a
  * predicate one layer can't serve falls through to the other.
  */
class ComposedSkippingSpec extends AnyFunSuite with SparkTestSession {

  /** 16 files: x clusters by file (zone-friendly), id scatters
    * (bloom-friendly). A probe on (x range, id IN) then has a real
    * intersection story: the zone map keeps the range's files, the
    * bloom keeps the keys' files, the stack keeps their overlap.
    */
  private lazy val layout: (String, String, String) = {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("composed_skip")
    val table = s"$root/t"
    (0 until 16).foreach { f =>
      (0 until 500).map(i => (f * 500L + i, f.toLong, s"name_${f}_$i"))
        .toDF("id", "x", "name")
        .coalesce(1).write.mode("append").parquet(table)
    }
    val (zm, bm) = (s"$root/zm", s"$root/bm")
    ZoneMap.build(s, table, Seq("x"), zm)
    FileBloom.build(s, table, "id", bm, m = 8192, k = 4)
    (table, zm, bm)
  }

  private def scanned(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case sc: FileSourceScanExec => sc
    }
    assert(scans.size === 1, "expected exactly one file scan")
    scans.head.metrics("numFiles").value
  }

  // ids 100 (file 0), 2600 (file 5), 7777 (file 15); x range [0, 8]
  // keeps files 0..8 — the intersection is files {0, 5}
  private val pred = col("x").between(0L, 8L) && col("id").isin(100L, 2600L, 7777L)

  test("the stack opens strictly fewer files than either index alone") {
    val (table, zm, bm) = layout
    val zoneOnly = scanned(IndexAdvisor
      .read(spark, table, Indexes(zoneMap = Some((zm, Set("x")))))
      .filter(pred))
    val bloomOnly = scanned(IndexAdvisor
      .read(spark, table, Indexes(bloom = Some((bm, "id"))))
      .filter(pred))
    val both = scanned(IndexAdvisor.read(spark, table,
        Indexes(zoneMap = Some((zm, Set("x"))), bloom = Some((bm, "id"))))
      .filter(pred))
    assert(zoneOnly === 9, s"zone map should keep the range's 9 files, kept $zoneOnly")
    assert(bloomOnly === 3, s"bloom should keep the keys' 3 files, kept $bloomOnly")
    assert(both === 2, s"the stack should keep the intersection {file0, file5}, kept $both")
  }

  test("the composed scan's answer equals the plain reader's") {
    val (table, zm, bm) = layout
    def probe(df: DataFrame): Set[String] = df.filter(pred)
      .select(concat_ws("|", col("id"), col("x"), col("name")))
      .collect().map(_.getString(0)).toSet
    val plain = probe(spark.read.parquet(table))
    assert(plain === Set("100|0|name_0_100", "2600|5|name_5_100"))
    assert(probe(IndexAdvisor.read(spark, table,
      Indexes(zoneMap = Some((zm, Set("x"))), bloom = Some((bm, "id"))))) === plain)
  }

  test("predicates stay pushed through the stacked listing") {
    val (table, zm, bm) = layout
    val df = IndexAdvisor.read(spark, table,
        Indexes(zoneMap = Some((zm, Set("x"))), bloom = Some((bm, "id"))))
      .filter(pred)
    df.collect()
    val scan = df.queryExecution.executedPlan.collect {
      case sc: FileSourceScanExec => sc
    }.head
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("id") && pushed.contains("x"),
      s"filters not pushed through the stack: $pushed")
  }

  test("a predicate only ONE layer serves still gets that layer's prune") {
    val (table, zm, bm) = layout
    val stack = Indexes(zoneMap = Some((zm, Set("x"))), bloom = Some((bm, "id")))
    // range only: bloom contributes nothing, zone prunes to 2 files
    assert(scanned(IndexAdvisor.read(spark, table, stack)
      .filter(col("x").between(3L, 4L))) === 2)
    // keys only: zone contributes nothing, bloom prunes to <= 2 + fpp
    val keysOnly = scanned(IndexAdvisor.read(spark, table, stack)
      .filter(col("id").isin(100L, 7777L)))
    assert(keysOnly < 16 && keysOnly >= 2, s"bloom layer inert in the stack: $keysOnly")
    // a predicate NEITHER serves scans everything
    assert(scanned(IndexAdvisor.read(spark, table, stack)
      .filter(col("name") === "name_3_3")) === 16)
  }

  test("catalog discovery: layers mount by predicate shape, unserved predicates scan plain") {
    val s = spark; import s.implicits._
    val (table, zm, bm) = layout
    // fresh table copy so the registered catalog never leaks into the
    // shared fixture's other tests
    val root = graft.core.Scratch.dir("composed_cat")
    val t2 = s"$root/t"
    (0 until 16).foreach { f =>
      s.read.parquet(table).filter(col("x") === f.toLong)
        .coalesce(1).write.mode("append").parquet(t2)
    }
    val (zm2, bm2) = (s"$root/zm", s"$root/bm")
    ZoneMap.build(s, t2, Seq("x"), zm2)
    FileBloom.build(s, t2, "id", bm2, m = 8192, k = 4)
    IndexAdvisor.register(s, t2, "zonemap", zm2, Seq("x"))
    IndexAdvisor.register(s, t2, "bloom", bm2, Seq("id"))
    // the catalog sidecar is invisible to data listings
    assert(graft.operators.IndexStat.liveStatus(s, t2)
      .forall { case (p, _, _) => !p.contains("_graft_indexes") })
    assert(IndexAdvisor.catalog(s, t2).map(_.kind).sorted === Seq("bloom", "zonemap"))
    // re-registration folds away
    IndexAdvisor.register(s, t2, "bloom", bm2, Seq("id"))
    assert(IndexAdvisor.catalog(s, t2).size === 2)

    // mixed predicate: both layers discovered, intersection opened,
    // answer equal to the plain scan — no index path in the call
    val (both, idxBoth) = IndexAdvisor.readDiscoveredWithIndexes(s, t2, pred)
    assert(idxBoth.exists(_.isInstanceOf[BloomFileIndex]),
      "mixed predicate should mount the bloom layer outermost")
    assert(scanned2(both) === 2)
    assert(both.select("id").collect().map(_.getLong(0)).toSet
      === Set(100L, 2600L))

    // range-only predicate: the bloom layer's column is not referenced
    // — only the zone map mounts (no probe job paid for nothing)
    val (rangeOnly, idxRange) = IndexAdvisor.readDiscoveredWithIndexes(
      s, t2, col("x").between(3L, 4L))
    assert(idxRange.exists(_.isInstanceOf[ZoneMapFileIndex]),
      "range predicate should mount exactly the zone-map layer")
    assert(scanned2(rangeOnly) === 2)

    // unserved predicate: no layer's column referenced — a PLAIN scan,
    // not an index mount that can't prune
    val (plain, idxPlain) = IndexAdvisor.readDiscoveredWithIndexes(
      s, t2, col("name") === "name_3_3")
    assert(idxPlain.isEmpty, "unserved predicate must mount a plain scan")
    assert(plain.count() === 1)
  }

  test("registration replaces same-(kind, columns) entries — a rebuild at " +
    "a new path never leaves the stale catalog row live") {
    val s = spark
    val (table, zm, bm) = layout
    val root = graft.core.Scratch.dir("composed_rereg")
    val t2 = s"$root/t"
    s.read.parquet(table).write.parquet(t2)
    val (zmA, zmB) = (s"$root/zmA", s"$root/zmB")
    ZoneMap.build(s, t2, Seq("x"), zmA)
    IndexAdvisor.register(s, t2, "zonemap", zmA, Seq("x"))
    // rebuild at a NEW path: the old row must be REPLACED (ADVICE r12
    // — a stale entry would mount a deleted index dir forever)
    ZoneMap.build(s, t2, Seq("x"), zmB)
    IndexAdvisor.register(s, t2, "zonemap", zmB, Seq("x"))
    val zms = IndexAdvisor.catalog(s, t2).filter(_.kind == "zonemap")
    assert(zms.map(_.path) === Seq(zmB), s"stale zonemap rows: $zms")
    // a bloom over a DIFFERENT column set coexists — it is a different
    // index, not a rebuild
    FileBloom.build(s, t2, "id", s"$root/bm1", m = 8192, k = 4)
    IndexAdvisor.register(s, t2, "bloom", s"$root/bm1", Seq("id"))
    IndexAdvisor.register(s, t2, "bloom", bm, Seq("name", "id"))
    assert(IndexAdvisor.catalog(s, t2).count(_.kind == "bloom") === 2)

    // unregister: the lifecycle complement for a DELETED index — the
    // matching row goes, everything else survives, and discovery for
    // the dropped kind falls back to a plain scan
    IndexAdvisor.unregister(s, t2, "bloom", Seq("id", "name")) // order-blind
    assert(IndexAdvisor.catalog(s, t2).count(_.kind == "bloom") === 1)
    IndexAdvisor.unregister(s, t2, "bloom", Seq("no", "such")) // no-op
    assert(IndexAdvisor.catalog(s, t2).size === 2)
    IndexAdvisor.unregister(s, t2, "zonemap", Seq("x"))
    val (_, mounted) = IndexAdvisor.readDiscoveredWithIndexes(s, t2,
      col("x").between(3, 4))
    assert(mounted.isEmpty, "unregistered zonemap must not mount a layer")
  }

  test("the bloom layer probes the column the predicate references, not " +
    "columns.head") {
    val s = spark
    val (table, _, _) = layout
    val root = graft.core.Scratch.dir("composed_bloomcol")
    val t2 = s"$root/t"
    (0 until 16).foreach { f =>
      s.read.parquet(table).filter(col("x") === f.toLong)
        .coalesce(1).write.mode("append").parquet(t2)
    }
    val bm2 = s"$root/bm"
    FileBloom.build(s, t2, "id", bm2, m = 8192, k = 4)
    // the registration lists a column the index does NOT serve FIRST —
    // the advisor must still probe with "id" when the predicate
    // references id (ADVICE r12: columns.head paid a probe that could
    // not prune)
    IndexAdvisor.register(s, t2, "bloom", bm2, Seq("name", "id"))
    val (df, idx) = IndexAdvisor.readDiscoveredWithIndexes(
      s, t2, col("id").isin(100L, 7777L))
    assert(idx.exists(_.isInstanceOf[BloomFileIndex]))
    val n = scanned2(df)
    assert(n < 16 && n >= 2, s"bloom probed the wrong column: opened $n files")
  }

  test("contribution kinds (ivfpq / sketch / dedup) register, discover to " +
    "probe handles, and unregistered tables fall through to None") {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("composed_contrib")

    // --- ivfpq ---
    val vecs = s"$root/vecs"
    (0 until 64).map(i =>
        (i.toLong, (0 until 16).map(t => ((i * 13 + t * 7) % 97) / 97.0f - 0.5f)))
      .toDF("vec_id", "embedding").coalesce(1).write.parquet(vecs)
    graft.operators.IvfPqIndex(vecs, s"$root/ivf", m = 4, subDim = 4).create(s)
    IndexAdvisor.register(s, vecs, "ivfpq", s"$root/ivf",
      Seq("vec_id", "embedding"), Map("m" -> "4", "subDim" -> "4"))
    val probes = s.read.parquet(vecs).filter(col("vec_id") === 0L)
    val direct = graft.operators.IvfPqIndex(vecs, s"$root/ivf", m = 4, subDim = 4)
      .probe(s, probes, k = 3, nprobe = 2)
      .collect().map(_.toString).sorted.toSeq
    val viaCat = IndexAdvisor.probeDiscovered(s, vecs, probes, k = 3, nprobe = 2)
      .collect().map(_.toString).sorted.toSeq
    assert(viaCat === direct, "discovered ivfpq probe drifted from the direct handle")

    // --- sketch ---
    val ord = s"$root/ord"
    (0 until 200).map(i => (1704067200L + (i % 6) * 2678400L, i.toLong % 37))
      .toDF("month_sec", "key").coalesce(1).write.parquet(ord)
    graft.operators.SketchIndex.writeMonthly(
      s.read.parquet(ord), "month_sec", "key", s"$root/sk", 64)
    IndexAdvisor.register(s, ord, "sketch", s"$root/sk",
      Seq("month_sec", "key"), Map("k" -> "64"))
    val disc = IndexAdvisor.sketchDiscovered(s, ord)
    assert(disc.exists(i => i.monthCol == "month_sec" && i.k == 64))
    assert(IndexAdvisor.sketchRangeDiscovered(s, ord,
      1704067200L, 1704067200L + 3 * 2678400L).count() === 3)

    // --- dedup ---
    val docsPath = s"$root/docs"
    val text = "the quick brown fox jumps over the lazy dog again and again"
    Seq((1L, text), (2L, "completely different words entirely here now"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(docsPath)
    val ddTable = "composed_contrib_dd"
    graft.llm.DedupIndex.create(s.read.parquet(docsPath), "text", "doc_id",
      ddTable, s"$root/dd", buckets = 2)
    IndexAdvisor.register(s, docsPath, "dedup", s"$root/dd",
      Seq("text", "doc_id"), Map("table" -> ddTable, "buckets" -> "2"))
    val inc = IndexAdvisor.incrementalCandidatesDiscovered(s, docsPath,
      Seq((10L, text)).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(inc.toSeq === Seq((10L, 1L)),
      s"discovered incremental dedup missed the planted dup: ${inc.toSeq}")

    // --- fall-through: an unregistered table discovers NOTHING ---
    val bare = s"$root/bare"
    Seq((1L, "a")).toDF("id", "v").write.parquet(bare)
    assert(IndexAdvisor.ivfPqDiscovered(s, bare).isEmpty)
    assert(IndexAdvisor.sketchDiscovered(s, bare).isEmpty)
    assert(IndexAdvisor.dedupDiscovered(s, bare).isEmpty)
    val thrown = intercept[IllegalArgumentException] {
      IndexAdvisor.probeDiscovered(s, bare, probes, k = 3, nprobe = 1)
    }
    assert(thrown.getMessage.contains("no ivfpq index registered"))
    // and an unknown kind is rejected at registration, loudly
    val bad = intercept[IllegalArgumentException] {
      IndexAdvisor.register(s, bare, "btree", s"$root/x", Seq("id"))
    }
    assert(bad.getMessage.contains("unknown index kind"))
  }

  /** [[scanned]] without the single-scan assertion's caching — the
    * discovery frames are built fresh per call.
    */
  private def scanned2(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case sc: FileSourceScanExec => sc
    }.map(_.metrics("numFiles").value).sum
  }

  test("discovery consults staleness: a grown base warns (default) or " +
    "fails per policy, for each of the five kinds; current indexes are silent") {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("composed_stalegate")

    def warnsDuring[T](body: => T): (T, Long) = {
      val before = IndexAdvisor.staleWarnings.get()
      val r = body
      (r, IndexAdvisor.staleWarnings.get() - before)
    }

    // --- skipping kinds: one table, zonemap(x) + bloom(id) ---
    val t = s"$root/t"
    (0 until 4).foreach { f =>
      (0 until 50).map(i => (f * 50L + i, f.toLong, s"n_${f}_$i"))
        .toDF("id", "x", "name").coalesce(1).write.mode("append").parquet(t)
    }
    ZoneMap.build(s, t, Seq("x"), s"$root/zm")
    FileBloom.build(s, t, "id", s"$root/bm", m = 4096, k = 4)
    IndexAdvisor.register(s, t, "zonemap", s"$root/zm", Seq("x"))
    IndexAdvisor.register(s, t, "bloom", s"$root/bm", Seq("id"))
    val p = col("x") === 1L && col("id") === 60L
    // current: both layers mount, zero warnings
    val (rows0, w0) = warnsDuring(
      IndexAdvisor.readDiscovered(s, t, p).count())
    assert(rows0 === 1L)
    assert(w0 === 0L, s"current indexes must be silent, got $w0 warnings")
    // grow the base: both layers' bases now have a never-indexed file
    Seq((99999L, 1L, "late")).toDF("id", "x", "name")
      .coalesce(1).write.mode("append").parquet(t)
    val (rows1, w1) = warnsDuring(
      IndexAdvisor.readDiscovered(s, t, p).count())
    assert(rows1 === 1L, "the answer stays correct (unknown files always scan)")
    assert(w1 === 2L, s"zonemap + bloom should each warn once, got $w1")
    intercept[IllegalStateException] {
      IndexAdvisor.readDiscovered(s, t, p, staleness = "fail").count()
    }
    val (_, wIgnore) = warnsDuring(
      IndexAdvisor.readDiscovered(s, t, p, staleness = "ignore").count())
    assert(wIgnore === 0L)
    intercept[IllegalArgumentException] {
      IndexAdvisor.readDiscovered(s, t, p, staleness = "loud")
    }

    // --- ivfpq (lifecycle-built: provenance + drift sidecars exist) ---
    val vecs = s"$root/vecs"
    (0 until 64).map(i =>
        (i.toLong, (0 until 16).map(tt => ((i * 13 + tt * 7) % 97) / 97.0f - 0.5f)))
      .toDF("vec_id", "embedding").coalesce(1).write.parquet(vecs)
    val ivf = graft.operators.IvfPqIndex(vecs, s"$root/ivf", m = 4, subDim = 4)
    ivf.create(s)
    IndexAdvisor.register(s, vecs, "ivfpq", s"$root/ivf",
      Seq("vec_id", "embedding"), Map("m" -> "4", "subDim" -> "4"))
    val probes = s.read.parquet(vecs).filter(col("vec_id") === 0L)
      .localCheckpoint(true)
    val (_, wv0) = warnsDuring(
      IndexAdvisor.probeDiscovered(s, vecs, probes, k = 3, nprobe = 2).count())
    assert(wv0 === 0L, "a current ivfpq index must be silent")
    Seq((1000L, (0 until 16).map(_ => 0.25f))).toDF("vec_id", "embedding")
      .coalesce(1).write.mode("append").parquet(vecs)
    val (_, wv1) = warnsDuring(
      IndexAdvisor.probeDiscovered(s, vecs, probes, k = 3, nprobe = 2).count())
    assert(wv1 === 1L, "a grown ivfpq base must warn at probe time")
    intercept[IllegalStateException] {
      IndexAdvisor.probeDiscovered(s, vecs, probes, k = 3, nprobe = 2,
        staleness = "fail")
    }

    // --- sketch (lifecycle-built via MonthlySketchIndex) ---
    val ord = s"$root/ord"
    (0 until 100).map(i => (1704067200L + (i % 3) * 2678400L, i.toLong % 17))
      .toDF("month_sec", "key").coalesce(1).write.parquet(ord)
    val msk = graft.operators.MonthlySketchIndex(ord, "month_sec", "key",
      s"$root/sk", 64)
    msk.create(s)
    IndexAdvisor.register(s, ord, "sketch", s"$root/sk",
      Seq("month_sec", "key"), Map("k" -> "64"))
    val (_, ws0) = warnsDuring(IndexAdvisor.sketchRangeDiscovered(
      s, ord, 1704067200L, 1704067200L + 3 * 2678400L).count())
    assert(ws0 === 0L, "a current sketch index must be silent")
    Seq((1704067200L, 999L)).toDF("month_sec", "key")
      .coalesce(1).write.mode("append").parquet(ord)
    val (_, ws1) = warnsDuring(IndexAdvisor.sketchRangeDiscovered(
      s, ord, 1704067200L, 1704067200L + 3 * 2678400L).count())
    assert(ws1 === 1L, "a grown sketch base must warn at probe time")
    intercept[IllegalStateException] {
      IndexAdvisor.sketchRangeDiscovered(s, ord, 1704067200L,
        1704067200L + 3 * 2678400L, staleness = "fail")
    }

    // --- dedup (lifecycle-built via MinhashDedupIndex) ---
    val docsPath = s"$root/docs"
    val text = "the quick brown fox jumps over the lazy dog again and again"
    Seq((1L, text), (2L, "completely different words entirely here now"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(docsPath)
    val ddIdx = graft.operators.MinhashDedupIndex(docsPath, "text", "doc_id",
      "stalegate_dd", s"$root/dd", buckets = 2)
    ddIdx.create(s)
    IndexAdvisor.register(s, docsPath, "dedup", s"$root/dd",
      Seq("text", "doc_id"), Map("table" -> "stalegate_dd", "buckets" -> "2"))
    val batch = Seq((10L, text)).toDF("doc_id", "text")
    val (inc0, wd0) = warnsDuring(IndexAdvisor
      .incrementalCandidatesDiscovered(s, docsPath, batch)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    assert(inc0 === Seq((10L, 1L)))
    assert(wd0 === 0L, "a current dedup index must be silent")
    Seq((3L, "yet more brand new words landing after the index build"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(docsPath)
    val (_, wd1) = warnsDuring(IndexAdvisor
      .incrementalCandidatesDiscovered(s, docsPath, batch).count())
    assert(wd1 === 1L, "a grown dedup base must warn at probe time")
    intercept[IllegalStateException] {
      IndexAdvisor.incrementalCandidatesDiscovered(s, docsPath, batch,
        staleness = "fail")
    }
  }

  test("quantizer drift trips the discovery gate, and retrainIfStale " +
    "clears it (the signal's consequent, re-baselined by create)") {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("composed_driftgate")
    val vecs = s"$root/vecs"
    (0 until 64).map(i =>
        (i.toLong, (0 until 16).map(tt => ((i * 13 + tt * 7) % 97) / 97.0f - 0.5f)))
      .toDF("vec_id", "embedding").coalesce(1).write.parquet(vecs)
    val idx = graft.operators.IvfPqIndex(vecs, s"$root/ivf", m = 4, subDim = 4)
    idx.create(s)
    // a SHIFTED append: frozen codebooks stop explaining the batch —
    // drift trips while the file-level provenance stays green (the
    // appended files ARE recorded; this is the signal staleFiles
    // cannot give)
    val pre = graft.operators.ZoneMap.dataFiles(s, vecs).toSet
    s.read.parquet(vecs)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(5.0f)).as("embedding"))
      .coalesce(1).write.mode("append").parquet(vecs)
    idx.append(s, graft.operators.ZoneMap.dataFiles(s, vecs)
      .filterNot(pre).toSeq)
    assert(idx.staleQuantizer(s), "the shifted append must trip drift")
    IndexAdvisor.register(s, vecs, "ivfpq", s"$root/ivf",
      Seq("vec_id", "embedding"), Map("m" -> "4", "subDim" -> "4"))
    val probes = s.read.parquet(vecs).filter(col("vec_id") === 0L)
      .localCheckpoint(true)
    val before = IndexAdvisor.staleWarnings.get()
    IndexAdvisor.probeDiscovered(s, vecs, probes, k = 3, nprobe = 2).count()
    assert(IndexAdvisor.staleWarnings.get() - before === 1L,
      "quantizer drift alone (files all recorded) must warn at probe time")
    intercept[IllegalStateException] {
      IndexAdvisor.probeDiscovered(s, vecs, probes, k = 3, nprobe = 2,
        staleness = "fail")
    }
    // the consequent: retrain re-runs create over the grown base,
    // re-baselining the signal — the gate goes quiet
    assert(idx.retrainIfStale(s), "retrainIfStale must fire while stale")
    assert(!idx.staleQuantizer(s), "create must re-baseline the drift signal")
    assert(!idx.retrainIfStale(s), "a clean signal must not retrain")
    val after = IndexAdvisor.staleWarnings.get()
    IndexAdvisor.probeDiscovered(s, vecs, probes, k = 3, nprobe = 2).count()
    assert(IndexAdvisor.staleWarnings.get() === after,
      "a retrained index must be silent at the gate")
  }

  test("the catalog read memoizes on (path, mtime): repeated discovery " +
    "against an unchanged catalog costs one filesystem load, and " +
    "register/unregister invalidate") {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("composed_catmemo")
    val t = s"$root/t"
    (0L until 100L).map(i => (i, i % 7)).toDF("id", "x").write.parquet(t)
    ZoneMap.build(s, t, Seq("x"), s"$root/zm")
    IndexAdvisor.register(s, t, "zonemap", s"$root/zm", Seq("x"))
    def loadsDuring(body: => Unit): Long = {
      val before = IndexAdvisor.catalogLoads.get()
      body
      IndexAdvisor.catalogLoads.get() - before
    }
    // first discovery after register loads once; the next N are memo hits
    val first = loadsDuring(
      IndexAdvisor.readDiscovered(s, t, col("x") === 3L).count())
    assert(first === 1L, s"first discovery should load the catalog once, got $first")
    val rest = loadsDuring((1 to 5).foreach { _ =>
      IndexAdvisor.readDiscovered(s, t, col("x") === 3L).count()
    })
    assert(rest === 0L, s"a probe-per-batch loop must not re-read an unchanged catalog, got $rest loads")
    // register invalidates (the new row must be visible immediately)
    FileBloom.build(s, t, "id", s"$root/bm", m = 4096, k = 4)
    IndexAdvisor.register(s, t, "bloom", s"$root/bm", Seq("id"))
    assert(IndexAdvisor.catalog(s, t).map(_.kind).sorted === Seq("bloom", "zonemap"))
    // unregister invalidates too — and validates the kind like register
    IndexAdvisor.unregister(s, t, "bloom", Seq("id"))
    assert(IndexAdvisor.catalog(s, t).map(_.kind) === Seq("zonemap"))
    val typo = intercept[IllegalArgumentException] {
      IndexAdvisor.unregister(s, t, "zone-map", Seq("x"))
    }
    assert(typo.getMessage.contains("unknown index kind"))
    assert(IndexAdvisor.catalog(s, t).map(_.kind) === Seq("zonemap"),
      "the typo'd unregister must not have touched the catalog")
  }

  test("the quantizer-drift verdict memoizes on the drift/fit sidecars' " +
    "mtimes: a probe-per-batch loop pays one evaluation, maintenance " +
    "invalidates (ADVICE r14)") {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("composed_quantmemo")
    val vecs = s"$root/vecs"
    (0 until 64).map(i =>
        (i.toLong, (0 until 16).map(tt => ((i * 13 + tt * 7) % 97) / 97.0f - 0.5f)))
      .toDF("vec_id", "embedding").coalesce(1).write.parquet(vecs)
    val idx = graft.operators.IvfPqIndex(vecs, s"$root/ivf", m = 4, subDim = 4)
    idx.create(s)
    IndexAdvisor.register(s, vecs, "ivfpq", s"$root/ivf",
      Seq("vec_id", "embedding"), Map("m" -> "4", "subDim" -> "4"))
    val probes = s.read.parquet(vecs).filter(col("vec_id") === 0L)
      .localCheckpoint(true)
    def checksDuring(body: => Unit): Long = {
      val before = IndexAdvisor.quantChecks.get()
      body
      IndexAdvisor.quantChecks.get() - before
    }
    val first = checksDuring(
      IndexAdvisor.probeDiscovered(s, vecs, probes, k = 3, nprobe = 2).count())
    assert(first === 1L,
      s"first discovery should evaluate the drift verdict once, got $first")
    val rest = checksDuring((1 to 5).foreach { _ =>
      IndexAdvisor.probeDiscovered(s, vecs, probes, k = 3, nprobe = 2).count()
    })
    assert(rest === 0L,
      s"a probe-per-batch loop must not re-run the drift job per batch, got $rest")
    // maintenance invalidates: an append rewrites the drift sidecar
    // (and a delete the fit sidecar), bumping the memo's mtime key
    val pre = graft.operators.ZoneMap.dataFiles(s, vecs).toSet
    s.read.parquet(vecs)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
      .coalesce(1).write.mode("append").parquet(vecs)
    idx.append(s, graft.operators.ZoneMap.dataFiles(s, vecs)
      .filterNot(pre).toSeq)
    val again = checksDuring(
      IndexAdvisor.probeDiscovered(s, vecs, probes, k = 3, nprobe = 2).count())
    assert(again === 1L,
      "a drift-sidecar rewrite must invalidate the memoized verdict")
  }

  test("a file landed after both indexes were built is always scanned") {
    val s = spark; import s.implicits._
    val (table, zm, bm) = layout
    // fresh copy of the fixture dirs so the cached layout stays clean
    val root = graft.core.Scratch.dir("composed_late")
    val t2 = s"$root/t"
    s.read.parquet(table).write.parquet(t2)
    val (zm2, bm2) = (s"$root/zm", s"$root/bm")
    ZoneMap.build(s, t2, Seq("x"), zm2)
    FileBloom.build(s, t2, "id", bm2, m = 8192, k = 4)
    Seq((99999L, 3L, "late")).toDF("id", "x", "name")
      .coalesce(1).write.mode("append").parquet(t2)
    val got = IndexAdvisor.read(s, t2,
        Indexes(zoneMap = Some((zm2, Set("x"))), bloom = Some((bm2, "id"))))
      .filter(col("x") === 3L && col("id") === 99999L)
      .select("name").collect().map(_.getString(0)).toSeq
    assert(got === Seq("late"), "a layer wrongly pruned an unknown file")
  }
}

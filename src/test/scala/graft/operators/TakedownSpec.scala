package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.sources.IndexAdvisor

/** One takedown verb across every registered index family (VERDICT
  * r14 ask #5): a table carrying ALL SIX kinds goes through a single
  * [[Takedown.apply]], and each family's post-delete read must equal
  * its own x89/x90/q77-shaped truth over the retained corpus — plus
  * the staleness gate must read CLEAN afterwards (the provenance
  * re-anchor), because a takedown that leaves every index warning
  * "stale" has not finished the job.
  */
class TakedownSpec extends AnyFunSuite with SparkTestSession {

  private def emb(i: Int, dim: Int = 16): Seq[Float] =
    (0 until dim).map(t => ((i * 13 + t * 7) % 97) / 97.0f - 0.5f)

  test("a six-family takedown: every index answers for corpus∖deleted, " +
    "and every staleness signal reads clean") {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("takedown")
    val table = s"$root/docs"

    // one table every family indexes: near-dup text groups (ids
    // sharing i/4 duplicate each other), months, embeddings
    val text = "the quick brown fox jumps over the lazy dog again and again"
    def rows(ids: Seq[Int]) = ids.map { i =>
      (i.toLong, s"$text group${i / 4}", (i % 6).toLong * 2592000L, emb(i))
    }.toDF("doc_id", "text", "month_sec", "embedding")
    rows(0 until 200).coalesce(1).write.parquet(table)

    s.sql("DROP TABLE IF EXISTS takedown_fp")
    s.sql("DROP TABLE IF EXISTS takedown_fp_g1")
    ZoneMapIndex(table, Seq("month_sec"), s"$root/zm").create(s)
    BloomIndex(table, "doc_id", s"$root/bm").create(s)
    IvfPqIndex(table, s"$root/ivf", m = 4, subDim = 4, sampleSize = 8,
      idCol = "doc_id", vecCol = "embedding").create(s)
    MonthlySketchIndex(table, "month_sec", "doc_id", s"$root/sk", k = 64)
      .create(s)
    MinhashDedupIndex(table, "text", "doc_id", "takedown_fp",
      s"$root/fp", buckets = 4).create(s)
    PerceptualHashIndex(table, "text", "doc_id", s"$root/ph").create(s)

    IndexAdvisor.register(s, table, "zonemap", s"$root/zm", Seq("month_sec"))
    IndexAdvisor.register(s, table, "bloom", s"$root/bm", Seq("doc_id"))
    IndexAdvisor.register(s, table, "ivfpq", s"$root/ivf",
      Seq("doc_id", "embedding"),
      Map("m" -> "4", "subDim" -> "4", "sampleSize" -> "8"))
    IndexAdvisor.register(s, table, "sketch", s"$root/sk",
      Seq("month_sec", "doc_id"), Map("k" -> "64"))
    IndexAdvisor.register(s, table, "dedup", s"$root/fp", Seq("text", "doc_id"),
      Map("table" -> "takedown_fp", "buckets" -> "4"))
    IndexAdvisor.register(s, table, "perceptual", s"$root/ph",
      Seq("text", "doc_id"))

    // the persisted pre-deletion label fixpoint (scoped relabel input)
    val priorLabels = graft.llm.DedupIndex.relabel(s, "takedown_fp")
      .localCheckpoint(true)

    // tombstones: doc_id % 10 == 9 — disjoint from the id-prefix
    // quantizer sample (ids < 8), so the ivfpq rebuild comparison
    // isolates the delete verb. Captured as FULL rows BEFORE the base
    // pass (sketch reads month_sec, dedup/ivfpq read doc_id).
    val dead = col("doc_id") % 10 === 9
    val tomb = s.read.parquet(table).filter(dead).localCheckpoint(true)
    val retained = s.read.parquet(table).filter(!dead).localCheckpoint(true)
    // the table service's own base deletion pass runs FIRST (the
    // Takedown ordering contract) — and it rewrites DATA FILES, not
    // the table directory: `_`-prefixed sidecars (the catalog, like a
    // lake format's _delta_log) survive any row-level delete
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    retained.coalesce(1).write.parquet(s"$root/docs_tmp")
    ZoneMap.dataFiles(s, table).foreach(f =>
      fs.delete(new org.apache.hadoop.fs.Path(f), false))
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/docs_tmp"))
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      .foreach(f => fs.rename(f.getPath,
        new org.apache.hadoop.fs.Path(s"$table/${f.getPath.getName}")))

    val applied = Takedown(s, table, tomb, priorLabels = Some(priorLabels))
    assert(applied.map(_.kind).sorted ===
      Seq("bloom", "dedup", "ivfpq", "perceptual", "sketch", "zonemap"))

    // ---- perceptual: no tombstoned fingerprint served, and the pairs
    // probe equals a fresh one-shot pass over the retained corpus
    val phIdx = IndexAdvisor.perceptualDiscovered(s, table).get
    assert(phIdx.content(s).filter(col("doc_id") % 10 === 9).isEmpty)
    def phPairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(phPairs(phIdx.pairs(s)) === phPairs(
      graft.llm.Multimodal.perceptualNearDupPairs(
        graft.llm.Multimodal.fingerprints(s.read.parquet(table), "text", "doc_id"),
        "doc_id", "ph")),
      "post-takedown perceptual pairs diverged from a fresh retained-corpus pass")

    // ---- dedup: the returned labels equal a from-scratch closure
    // over the retained corpus (the x89/x92 truth)
    val scratch = graft.llm.Dedup.connectedComponents(
        graft.llm.Dedup.minhashCandidates(
          s.read.parquet(table), "text", "doc_id"), "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val gotLabels = applied.find(_.kind == "dedup").get.labels.get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotLabels === scratch,
      "takedown labels diverged from the from-scratch closure over retained docs")
    // ...and the flipped generation holds no tombstoned fingerprints
    val fpIdx = IndexAdvisor.dedupDiscovered(s, table).get
    assert(fpIdx.content(s).filter(col("doc_id") % 10 === 9).isEmpty)

    // ---- ivfpq: post-delete probe == a rebuild over corpus∖deleted
    // (same id-prefix sample → same frozen quantizers — the x90 truth)
    val probes = s.read.parquet(table).filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("embedding")).localCheckpoint(true)
    def digest(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("probe_id", "rnk").collect()
        .map(r => s"${r.getLong(0)}>${r.getLong(1)}@${r.getLong(2)}#${r.getLong(3)}")
        .toSeq
    val rebuilt = IvfPqIndex(table, s"$root/ivf_rebuilt", m = 4, subDim = 4,
      sampleSize = 8, idCol = "doc_id", vecCol = "embedding")
    rebuilt.create(s)
    val served = IndexAdvisor.ivfPqDiscovered(s, table).get
      .probe(s, probes, k = 3, nprobe = 2)
    assert(digest(served) === digest(rebuilt.probe(s, probes, k = 3, nprobe = 2)),
      "post-takedown ANN probe diverged from a rebuild over retained vectors")

    // ---- sketch: month sketches bit-equal a from-scratch build over
    // the retained rows (the q77 truth)
    SketchIndex.writeMonthly(s.read.parquet(table), "month_sec", "doc_id",
      s"$root/sk_scratch", k = 64)
    def sketchBytes(dir: String) =
      SketchIndex.read(s, dir).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
        .map { case (m, sk) => (m, sk.toList) }
    assert(sketchBytes(s"$root/sk") === sketchBytes(s"$root/sk_scratch"),
      "post-takedown sketches diverged from a retained-rows rebuild")

    // ---- every family's staleness signals read CLEAN: the per-file
    // kinds re-anchored on the live listing, the contribution kinds'
    // provenance was reset, and no quantizer drift fired (the parity
    // deletion here thins groups evenly)
    IndexAdvisor.catalog(s, table).foreach { e =>
      val (stale, unseen, quant) = IndexAdvisor.stalenessOf(s, table, e)
      assert(stale.isEmpty && unseen.isEmpty && !quant,
        s"${e.kind} reads stale after the takedown: " +
          s"(${stale.size} stale, ${unseen.size} unseen, quant=$quant)")
    }
  }

  test("per-file re-anchor is delta-priced: only the rewritten file is " +
    "rescanned, untouched files' stats rows pass through verbatim") {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("takedown_delta")
    val table = s"$root/docs"
    // four deterministic data files: one coalesced append per id range
    (0 until 4).foreach { g =>
      (g * 50 until (g + 1) * 50).map(i => (i.toLong, (i % 6).toLong * 2592000L))
        .toDF("doc_id", "month_sec")
        .coalesce(1).write.mode("append").parquet(table)
    }
    ZoneMapIndex(table, Seq("doc_id"), s"$root/zm").create(s)
    BloomIndex(table, "doc_id", s"$root/bm").create(s)
    IndexAdvisor.register(s, table, "zonemap", s"$root/zm", Seq("doc_id"))
    IndexAdvisor.register(s, table, "bloom", s"$root/bm", Seq("doc_id"))

    // the rows of every UNTOUCHED file, captured whole — the x90
    // file-identity discipline applied to stats rows: the re-anchor
    // must not re-derive (or even perturb) what the takedown didn't touch
    def rowsByFile(path: String) = s.read.parquet(path).collect()
      .map(r => r.getAs[String]("file") -> r.toSeq.map(String.valueOf).mkString("|"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // tombstones live in exactly ONE file (ids 150..199, the 4th
    // append); the base pass rewrites that file alone
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val victim = s.read.parquet(table)
      .filter(col("doc_id") >= 150).select(input_file_name())
      .distinct().collect().map(_.getString(0))
    assert(victim.length === 1, s"fixture: expected one victim file, got ${victim.toSeq}")
    val tomb = s.read.parquet(table).filter(col("doc_id") % 10 === 3 &&
      col("doc_id") >= 150).localCheckpoint(true)
    s.read.parquet(victim.head)
      .join(tomb.select("doc_id"), Seq("doc_id"), "left_anti")
      .coalesce(1).write.parquet(s"$root/rewrite_tmp")
    fs.delete(new org.apache.hadoop.fs.Path(victim.head), false)
    val landed = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/rewrite_tmp"))
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_")).map(_.getPath)
    assert(landed.length === 1)
    val newFile = s"$table/${landed.head.getName}"
    fs.rename(landed.head, new org.apache.hadoop.fs.Path(newFile))

    val zmBefore = rowsByFile(s"$root/zm")
    val bmBefore = rowsByFile(s"$root/bm")
    val applied = Takedown(s, table, tomb)
    assert(applied.map(_.kind).sorted === Seq("bloom", "zonemap"))

    // delta pricing: the ONLY rescanned file is the rewritten one
    applied.foreach { a =>
      assert(a.rescanned.map(IndexStat.canon) === Seq(IndexStat.canon(newFile)),
        s"${a.kind} rescanned ${a.rescanned} — expected only the rewritten file")
    }
    // untouched files' stats rows are identical, the dead file's are gone,
    // and the new file has exactly one fresh row per relation
    Seq((s"$root/zm", zmBefore), (s"$root/bm", bmBefore)).foreach {
      case (path, before) =>
        val after = rowsByFile(path)
        val untouched = before.keySet - victim.head
        untouched.foreach { f =>
          assert(after(f) === before(f), s"$path: stats row of untouched $f changed")
        }
        assert(!after.contains(victim.head),
          s"$path: dead file's fingerprint still in the stats relation")
        assert(after.keySet.map(IndexStat.canon) ===
          (untouched + newFile).map(IndexStat.canon))
    }
    // and the re-anchored relations still answer correctly + read clean
    val got = ZoneMap.readPruned(s, table, s"$root/zm",
        Seq(ZoneMap.Range("doc_id", 140, 199)))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val want = s.read.parquet(table).filter(col("doc_id").between(140, 199))
      .collect().map(_.getLong(0)).sorted
    assert(got === want)
    IndexAdvisor.catalog(s, table).foreach { e =>
      val (stale, unseen, _) = IndexAdvisor.stalenessOf(s, table, e)
      assert(stale.isEmpty && unseen.isEmpty, s"${e.kind} stale after re-anchor")
    }
  }

  test("a LabelStore at the <indexPath>_labels convention becomes the " +
    "takedown's default priorLabels path; stacked takedowns keep O(touched) " +
    "label writes") {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("takedown_store")
    val table = s"$root/docs"
    val text = "the quick brown fox jumps over the lazy dog again and again"
    (0 until 200).map(i => (i.toLong, s"$text group${i / 4}"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(table)
    s.sql("DROP TABLE IF EXISTS tkstore_fp")
    s.sql("DROP TABLE IF EXISTS tkstore_fp_g1")
    s.sql("DROP TABLE IF EXISTS tkstore_fp_g2")
    MinhashDedupIndex(table, "text", "doc_id", "tkstore_fp",
      s"$root/fp", buckets = 4).create(s)
    IndexAdvisor.register(s, table, "dedup", s"$root/fp", Seq("text", "doc_id"),
      Map("table" -> "tkstore_fp", "buckets" -> "4"))
    // the deployment seeds the store once from the initial fixpoint —
    // the `<indexPath>_labels` convention Takedown discovers
    graft.llm.LabelStore.create(s, s"$root/fp_labels",
      graft.llm.DedupIndex.relabel(s, "tkstore_fp"))

    var pass = 0
    def basePass(dead: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
      val tomb = s.read.parquet(table).filter(dead).localCheckpoint(true)
      val retained = s.read.parquet(table).filter(!dead).localCheckpoint(true)
      val fs = new org.apache.hadoop.fs.Path(table)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      pass += 1
      val tmp = s"$root/rewrite_tmp$pass"
      retained.coalesce(1).write.parquet(tmp)
      ZoneMap.dataFiles(s, table).foreach(f =>
        fs.delete(new org.apache.hadoop.fs.Path(f), false))
      fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
        .foreach(f => fs.rename(f.getPath,
          new org.apache.hadoop.fs.Path(s"$table/${f.getPath.getName}")))
      tomb
    }
    def scratchLabels = graft.llm.Dedup.connectedComponents(
        graft.llm.Dedup.minhashCandidates(
          s.read.parquet(table), "text", "doc_id"), "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    def labelsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    // takedown 1 — NO caller labels: the store is discovered
    val tomb1 = basePass(col("doc_id") % 10 === 9)
    val got1 = Takedown(s, table, tomb1).find(_.kind == "dedup").get.labels.get
    assert(labelsOf(got1) === scratchLabels,
      "store-backed takedown labels diverged from the from-scratch closure")
    // the store carries the post-delete view for the NEXT takedown,
    // written as a delta batch (O(touched)), not a base rewrite
    assert(labelsOf(graft.llm.LabelStore.read(s, s"$root/fp_labels")) ===
      labelsOf(got1))
    assert(graft.llm.LabelStore.tombstones(s, s"$root/fp_labels").count() === 20)

    // takedown 2 stacks on the store's merge-on-read view
    val tomb2 = basePass(col("doc_id") % 10 === 4)
    val got2 = Takedown(s, table, tomb2).find(_.kind == "dedup").get.labels.get
    assert(labelsOf(got2) === scratchLabels,
      "second store-backed takedown diverged after stacking deltas")
    assert(labelsOf(graft.llm.LabelStore.read(s, s"$root/fp_labels")) ===
      labelsOf(got2))
  }

  test("two same-kind registrations are each dispatched from their own " +
    "catalog entry — neither keeps serving deleted ids (ADVICE r15)") {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("takedown_twin")
    val table = s"$root/vecs"
    (0 until 120).map(i => (i.toLong, emb(i), emb(i * 31 + 5)))
      .toDF("doc_id", "emb_a", "emb_b")
      .coalesce(1).write.parquet(table)
    val ia = IvfPqIndex(table, s"$root/ivf_a", m = 4, subDim = 4,
      sampleSize = 8, idCol = "doc_id", vecCol = "emb_a")
    val ib = IvfPqIndex(table, s"$root/ivf_b", m = 4, subDim = 4,
      sampleSize = 8, idCol = "doc_id", vecCol = "emb_b")
    ia.create(s); ib.create(s)
    IndexAdvisor.register(s, table, "ivfpq", s"$root/ivf_a",
      Seq("doc_id", "emb_a"), Map("m" -> "4", "subDim" -> "4", "sampleSize" -> "8"))
    IndexAdvisor.register(s, table, "ivfpq", s"$root/ivf_b",
      Seq("doc_id", "emb_b"), Map("m" -> "4", "subDim" -> "4", "sampleSize" -> "8"))

    val dead = col("doc_id") % 10 === 9
    val tomb = s.read.parquet(table).filter(dead).localCheckpoint(true)
    val retained = s.read.parquet(table).filter(!dead).localCheckpoint(true)
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    retained.coalesce(1).write.parquet(s"$root/vecs_tmp")
    ZoneMap.dataFiles(s, table).foreach(f =>
      fs.delete(new org.apache.hadoop.fs.Path(f), false))
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/vecs_tmp"))
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      .foreach(f => fs.rename(f.getPath,
        new org.apache.hadoop.fs.Path(s"$table/${f.getPath.getName}")))

    val applied = Takedown(s, table, tomb)
    assert(applied.map(_.path).sorted === Seq(s"$root/ivf_a", s"$root/ivf_b"),
      "takedown must visit BOTH same-kind registrations, not the first twice")
    // the erasure contract: neither index's code relation holds a
    // tombstoned id anymore (pre-fix the second index kept serving them)
    Seq(ia, ib).foreach { idx =>
      assert(idx.content(s).filter(col("neighbor_id") % 10 === 9).isEmpty,
        s"${idx.dir} still serves deleted ids")
    }
  }
}

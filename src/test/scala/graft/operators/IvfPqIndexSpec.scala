package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.llm.Similarity

/** The persisted-ANN contract beyond the shared lifecycle
  * (PersistedIndexSpec covers create/append/compact/staleness):
  *
  *  1. a probe of the PERSISTED index answers bit-identically to the
  *     ephemeral [[Similarity.ivfPqTopK]] over the same corpus and
  *     dials — persistence must change WHERE the codes live, never
  *     what they say;
  *  2. create-then-append equals one big create: appends encode
  *     against the FROZEN quantizers, so maintenance never drifts the
  *     index away from a rebuild;
  *  3. the probe's codes scan is PARTITION-PRUNED to the probed
  *     inverted lists — the IVF lookup is directory pruning, so probe
  *     I/O is nprobe/K of the corpus at any corpus size.
  */
class IvfPqIndexSpec extends AnyFunSuite with SparkTestSession {

  private def emb(i: Int, dim: Int = 16): Seq[Float] =
    (0 until dim).map(t => ((i * 13 + t * 7) % 97) / 97.0f - 0.5f)

  private def writeVecs(path: String, ids: Range): Unit = {
    val s = spark; import s.implicits._
    ids.map(i => (i.toLong, emb(i))).toDF("vec_id", "embedding")
      .coalesce(1).write.mode("append").parquet(path)
  }

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(scans)
  }

  private def digest(df: DataFrame): Seq[String] =
    df.orderBy("probe_id", "rnk").collect()
      .map(r => s"${r.getLong(0)}>${r.getLong(1)}@${r.getLong(2)}#${r.getLong(3)}")
      .toSeq

  test("persisted probe ≡ ephemeral ivfPqTopK, and append ≡ rebuild") {
    val s = spark
    val root = graft.core.Scratch.dir("ivfpq")
    val table = s"$root/vecs"
    writeVecs(table, 0 until 300)
    val idx = IvfPqIndex(table, s"$root/idx", m = 4, subDim = 4,
      sampleSize = 8)
    idx.create(s)
    assert(idx.staleFiles(s).isEmpty)

    val corpus = s.read.parquet(table)
    val probes = corpus.filter(col("vec_id") % 101 === 0)
    val persisted = digest(idx.probe(s, probes, k = 3, nprobe = 2))

    // 1. the ephemeral path over the same corpus/dials answers the same
    val sample = corpus.filter(col("vec_id") < 8)
    val cbs = Similarity.pqCodebooks(sample, m = 4, subDim = 4)
    val ephemeral = digest(Similarity.ivfPqTopK(
      corpus, probes, centroids = sample, codebooks = cbs,
      k = 3, nprobe = 2, subDim = 4))
    assert(persisted === ephemeral,
      "persisting the codes changed a probe answer")

    // 2. append against the frozen quantizers ≡ one big create
    val before = ZoneMap.dataFiles(s, table).toSet
    writeVecs(table, 300 until 400)
    val landed = ZoneMap.dataFiles(s, table).filterNot(before).toSeq
    idx.append(s, landed)
    assert(idx.staleFiles(s).isEmpty)
    val appended = digest(idx.probe(s, probes, k = 3, nprobe = 2))

    val rebuilt = IvfPqIndex(table, s"$root/idx_rebuild", m = 4, subDim = 4,
      sampleSize = 8)
    rebuilt.create(s)
    assert(digest(rebuilt.probe(s, probes, k = 3, nprobe = 2)) === appended,
      "append-maintained index drifted from a from-scratch rebuild")

    // …and compaction is layout-only
    idx.compact(s)
    assert(digest(idx.probe(s, probes, k = 3, nprobe = 2)) === appended)
    // a vector appears exactly once per subspace after compaction
    assert(idx.content(s).groupBy("neighbor_id", "subspace").count()
      .filter(col("count") > 1).count() === 0)
  }

  test("compaction rewrites ONLY dirty cluster directories, and probe " +
    "answers survive a replayed append even before compact runs") {
    val s = spark
    val root = graft.core.Scratch.dir("ivfpq_inc_compact")
    val table = s"$root/vecs"
    writeVecs(table, 0 until 300)
    val idx = IvfPqIndex(table, s"$root/idx", m = 4, subDim = 4,
      sampleSize = 8)
    idx.create(s)
    idx.compact(s) // baseline: one file per cluster directory

    def listing(): Map[String, Set[(String, Long, Long)]] = {
      val fs = new org.apache.hadoop.fs.Path(s"$root/idx/codes")
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/idx/codes"))
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("cluster="))
        .map { d =>
          d.getPath.getName -> fs.listStatus(d.getPath)
            .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
              !f.getPath.getName.startsWith("."))
            .map(f => (f.getPath.toString, f.getLen, f.getModificationTime))
            .toSet
        }.toMap
    }
    val before = listing()
    assert(before.values.forall(_.size == 1), "baseline not one file per list")

    // a small append dirties only the clusters its vectors land in
    val preFiles = ZoneMap.dataFiles(s, table).toSet
    writeVecs(table, 300 until 310)
    val landed = ZoneMap.dataFiles(s, table).filterNot(preFiles).toSeq
    idx.append(s, landed)
    val preProbe = digest(idx.probe(s,
      s.read.parquet(table).filter(col("vec_id") % 101 === 0), k = 3, nprobe = 2))

    // REPLAY the append (at-least-once delivery): duplicate code rows
    // exist until compact, but the probe dedupes at read time — the
    // answer must not change (ADVICE r12, medium)
    idx.append(s, landed)
    assert(idx.content(s).groupBy("neighbor_id", "subspace").count()
      .filter(col("count") > 1).count() > 0,
      "fixture degenerate: replay left no duplicate code rows")
    assert(digest(idx.probe(s,
      s.read.parquet(table).filter(col("vec_id") % 101 === 0),
      k = 3, nprobe = 2)) === preProbe,
      "a replayed append corrupted probe ranking before compact")

    val dirtied = listing()
    val dirtyDirs = dirtied.filter { case (dname, files) =>
      files != before(dname) }.keySet
    assert(dirtyDirs.nonEmpty, "fixture degenerate: append dirtied no list")
    assert(dirtyDirs.size < before.size,
      "fixture degenerate: append dirtied EVERY list — dirty-only is untestable")

    idx.compact(s)
    val after = listing()
    // clean directories: byte-identical file identity — never rewritten
    (before.keySet -- dirtyDirs).foreach { dname =>
      assert(after(dname) === before(dname),
        s"compact rewrote CLEAN list $dname")
    }
    // dirty directories: folded back to one file, duplicates gone
    dirtyDirs.foreach { dname =>
      assert(after(dname).size === 1, s"dirty list $dname not folded")
    }
    assert(idx.content(s).groupBy("neighbor_id", "subspace").count()
      .filter(col("count") > 1).count() === 0)
    assert(digest(idx.probe(s,
      s.read.parquet(table).filter(col("vec_id") % 101 === 0),
      k = 3, nprobe = 2)) === preProbe, "compaction changed a probe answer")
  }

  test("quantizer drift: a shifted-distribution append trips " +
    "staleQuantizer; answer-parity appends never do") {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("ivfpq_drift")
    val table = s"$root/vecs"
    writeVecs(table, 0 until 300)
    val idx = IvfPqIndex(table, s"$root/idx", m = 4, subDim = 4,
      sampleSize = 8)
    idx.create(s)
    assert(!idx.staleQuantizer(s), "no appends yet — nothing can have drifted")

    // same-distribution append: reconstruction error stays at the
    // create-time level, the signal stays quiet
    val pre1 = ZoneMap.dataFiles(s, table).toSet
    writeVecs(table, 300 until 400)
    idx.append(s, ZoneMap.dataFiles(s, table).filterNot(pre1).toSeq)
    assert(!idx.staleQuantizer(s),
      "an answer-parity append tripped the drift signal")

    // SHIFTED distribution: vectors far outside the trained books'
    // range — frozen quantizers stop explaining the data, error jumps
    val pre2 = ZoneMap.dataFiles(s, table).toSet
    (400 until 500).map(i => (i.toLong, emb(i).map(_ + 5.0f)))
      .toDF("vec_id", "embedding")
      .coalesce(1).write.mode("append").parquet(table)
    idx.append(s, ZoneMap.dataFiles(s, table).filterNot(pre2).toSeq)
    assert(idx.staleQuantizer(s),
      "a shifted-distribution append did not trip the drift signal")
    // the monitoring view: pooled per-phase means, append >> create
    val drift = idx.quantizerDrift(s).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(drift("append") > drift("create") * 2,
      s"drift view inconsistent with the signal: $drift")
    // staleFiles stays about FILES — the drift signal is orthogonal
    assert(idx.staleFiles(s).isEmpty)
    // compaction pools the drift rows without changing the verdict
    idx.compact(s)
    assert(idx.staleQuantizer(s))
    // retrain (= create) re-baselines: the books now explain the data
    idx.create(s)
    assert(!idx.staleQuantizer(s), "create did not re-baseline the signal")
  }

  test("deployment-shaped dials (sampleSize ≈ √corpus, lloydRounds > 0): " +
    "full lifecycle, recall ≥ the toy sample's on a shifted corpus") {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("ivfpq_deploy")
    val table = s"$root/vecs"
    // a corpus the toy sample UNDER-FITS: even ids cluster near the
    // emb() range, odd ids live +4.0 away — two real modes. The
    // oracle-discipline sample (ids < 8) sees 4 of each mode but
    // freezes centroids ON THE FIRST IDS' COORDINATES; the deployment
    // dials draw √400 = 20 sample vectors AND Lloyd-move the coarse
    // centroids to the data's mass.
    def vec(i: Int): Seq[Float] =
      emb(i).map(v => if (i % 2 == 0) v else v + 4.0f)
    (0 until 400).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding").coalesce(1).write.parquet(table)

    val toy = IvfPqIndex(table, s"$root/idx_toy", m = 4, subDim = 4,
      sampleSize = 8, lloydRounds = 0)
    val deploy = IvfPqIndex(table, s"$root/idx_deploy", m = 4, subDim = 4,
      sampleSize = 20, lloydRounds = 2)
    toy.create(s)
    deploy.create(s)

    // lifecycle under the deployment dials: append ≡ rebuild holds
    // (appends encode against the FROZEN refined quantizers)
    val pre = ZoneMap.dataFiles(s, table).toSet
    (400 until 440).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding").coalesce(1).write.mode("append").parquet(table)
    deploy.append(s, ZoneMap.dataFiles(s, table).filterNot(pre).toSeq)
    toy.append(s, ZoneMap.dataFiles(s, table).filterNot(pre).toSeq)
    val rebuilt = IvfPqIndex(table, s"$root/idx_rebuild", m = 4, subDim = 4,
      sampleSize = 20, lloydRounds = 2)
    rebuilt.create(s)
    val probes = s.read.parquet(table).filter(col("vec_id") % 37 === 0)
    assert(digest(deploy.probe(s, probes, k = 3, nprobe = 2)) ===
      digest(rebuilt.probe(s, probes, k = 3, nprobe = 2)),
      "deployment-dial append drifted from a rebuild")

    // recall vs exact L2 ground truth (computed driver-side on the
    // 440-vector fixture): the refined index must not lose to the toy
    val all = s.read.parquet(table).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    def l2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val probeIds = all.keys.filter(_ % 37 == 0).toSeq
    val exact: Set[(Long, Long)] = probeIds.flatMap { p =>
      all.keys.filter(_ != p).toSeq
        .sortBy(n => (l2(all(p), all(n)), n)).take(3).map(p -> _)
    }.toSet
    // generous nprobe on both sides so coarse-list pruning is not the
    // differentiator — the comparison isolates QUANTIZER FIT, which is
    // what the dials buy (the documented tiny-corpus floor caps the
    // absolute number at this scale: Similarity.ivfPqTopK scaladoc)
    def recallOf(idx: IvfPqIndex): Double = {
      val got = idx.probe(s, probes, k = 3, nprobe = 4)
        .select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val (rToy, rDeploy) = (recallOf(toy), recallOf(deploy))
    info(f"recall@3: toy dials $rToy%.3f, deployment dials $rDeploy%.3f")
    assert(rDeploy > rToy,
      f"deployment dials did not beat the toy sample: $rDeploy%.3f <= $rToy%.3f")
  }

  test("retrainIfStale under deployment dials: a shifted append trips " +
    "drift, retrain clears the signal and recovers recall on the " +
    "shifted corpus") {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("ivfpq_retrain")
    val table = s"$root/vecs"
    // EVEN ids: the original mode. The later drifted batch lands on
    // the odd ids — a well-mixed id space, so the deterministic
    // id-prefix retrain sample covers BOTH modes (the precondition for
    // retraining to follow a drifted distribution; an id space where
    // new landings only ever get higher ids re-reads the same sample
    // forever, and retrain can only re-baseline the signal there)
    (0 until 300).map(i => (2L * i, emb(i)))
      .toDF("vec_id", "embedding").coalesce(1).write.parquet(table)
    // deployment dials: Lloyd iterates over the FULL base and the PQ
    // sample spans both modes after the drifted batch lands
    val idx = IvfPqIndex(table, s"$root/idx", m = 4, subDim = 4,
      sampleSize = 34, lloydRounds = 2)
    idx.create(s)
    assert(!idx.staleQuantizer(s) && !idx.retrainIfStale(s),
      "a fresh index must neither read stale nor retrain")

    // the drifted mode lands: +6.0 per coordinate, far outside the
    // trained books' reach
    val pre = ZoneMap.dataFiles(s, table).toSet
    (0 until 300).map(i => (2L * i + 1, emb(i).map(_ + 6.0f)))
      .toDF("vec_id", "embedding").coalesce(1).write.mode("append").parquet(table)
    idx.append(s, ZoneMap.dataFiles(s, table).filterNot(pre).toSeq)
    assert(idx.staleQuantizer(s), "the shifted append must trip drift")

    // exact L2 ground truth over the grown corpus, probes drawn from
    // the SHIFTED mode (the rows the frozen quantizers explain worst)
    val all = s.read.parquet(table).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    def l2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val probeIds = all.keys.filter(id => id % 2 == 1 && id % 29 == 0).toSeq
    val exact: Set[(Long, Long)] = probeIds.flatMap { p =>
      all.keys.filter(_ != p).toSeq
        .sortBy(n => (l2(all(p), all(n)), n)).take(3).map(p -> _)
    }.toSet
    val probes = s.read.parquet(table)
      .filter(col("vec_id") % 2 === 1 && col("vec_id") % 29 === 0)
      .localCheckpoint(true)
    def recall(): Double = {
      val got = idx.probe(s, probes, k = 3, nprobe = 4)
        .select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val before = recall()
    assert(idx.retrainIfStale(s), "retrainIfStale must fire while stale")
    assert(!idx.staleQuantizer(s),
      "create must re-baseline the drift signal over the grown base")
    val after = recall()
    info(f"recall@3 on the shifted mode: pre-retrain $before%.3f, post-retrain $after%.3f")
    // deterministic fixture: the measured recovery is 0.000 -> 0.400
    assert(after > before,
      f"retrain must RECOVER recall on the shifted corpus ($before%.3f -> $after%.3f)")
    assert(!idx.retrainIfStale(s), "a re-baselined signal must not retrain again")
  }

  test("delete: tombstoned vectors leave the lists, only dirty cluster " +
    "dirs are rewritten, emptied lists vanish, and the probe equals a " +
    "rebuild over the retained corpus") {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("ivfpq_delete")
    val table = s"$root/vecs"
    writeVecs(table, 0 until 64)
    val idx = IvfPqIndex(table, s"$root/idx", m = 4, subDim = 4)
    idx.create(s)

    def filesByCluster(): Map[String, Set[String]] = {
      val fs = new org.apache.hadoop.fs.Path(s"$root/idx/codes")
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/idx/codes"))
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("cluster="))
        .map(d => d.getPath.getName ->
          fs.listStatus(d.getPath).filter(_.isFile)
            .map(f => s"${f.getPath.getName}@${f.getLen}@${f.getModificationTime}")
            .toSet)
        .toMap
    }
    val before = filesByCluster()

    // tombstones DISJOINT from the quantizer sample (ids < 8), so a
    // rebuild over the retained base trains the SAME quantizers and
    // the probe comparison isolates the delete verb itself
    val deadIds = (8 until 64).filter(_ % 7 === 5).map(_.toLong)
    val dirtyClusters = idx.content(s)
      .filter(col("neighbor_id").isin(deadIds: _*))
      .select("cluster").distinct().collect().map(_.getLong(0))
      .map(c => s"cluster=$c").toSet
    idx.delete(s, deadIds.toDF("vec_id"))

    // clean lists keep their files byte-identical; dirty ones changed
    val after = filesByCluster()
    before.keys.filterNot(dirtyClusters).foreach { c =>
      assert(after(c) === before(c), s"clean list $c was rewritten")
    }
    dirtyClusters.foreach { c =>
      assert(after.get(c).forall(_ != before(c)), s"dirty list $c untouched")
    }

    // the index no longer holds (or serves) any tombstoned id
    assert(idx.content(s).filter(col("neighbor_id").isin(deadIds: _*)).isEmpty)
    val probes = s.read.parquet(table)
      .filter(col("vec_id") % 11 === 0 && !col("vec_id").isin(deadIds: _*))
      .localCheckpoint(true)
    val got = idx.probe(s, probes, k = 3, nprobe = 2)
    assert(got.filter(col("neighbor_id").isin(deadIds: _*)).isEmpty,
      "a probe served a deleted vector")

    // probe == a from-scratch index over corpus∖deleted (frozen-
    // quantizer equality: encoding is per-vector, dropping rows IS the
    // rebuild's code relation)
    val keptTable = s"$root/vecs_kept"
    s.read.parquet(table).filter(!col("vec_id").isin(deadIds: _*))
      .write.parquet(keptTable)
    val rebuilt = IvfPqIndex(keptTable, s"$root/idx_rebuilt", m = 4, subDim = 4)
    rebuilt.create(s)
    assert(digest(got) === digest(rebuilt.probe(s, probes, k = 3, nprobe = 2)),
      "post-delete probe drifted from a rebuild over the retained corpus")

    // an entirely-tombstoned list's directory is REMOVED, not left as
    // stale files the dynamic overwrite couldn't touch
    val victim = idx.content(s).groupBy("cluster")
      .agg(collect_set("neighbor_id").as("members"))
      .orderBy("cluster").head()
    val victimCluster = victim.getLong(0)
    val victimIds = victim.getSeq[Long](1)
    idx.delete(s, victimIds.toDF("vec_id"))
    assert(!filesByCluster().contains(s"cluster=$victimCluster"),
      s"emptied list cluster=$victimCluster left stale files behind")
    assert(idx.content(s).filter(col("cluster") === victimCluster).isEmpty)
  }

  test("post-delete drift: a dominant-mode takedown trips staleQuantizer " +
    "over the retained rows, answer-parity deletions never do, and " +
    "retrainIfStale recovers recall on the survivors") {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("ivfpq_del_drift")
    // two modes, well mixed in id space: ids ≡ 1 (mod 4) live +20.0
    // away (the minority the frozen books COLLAPSE — every +20
    // sub-vector maps to the same nearest in-range codeword, so ADC
    // distances degenerate — and the mode the takedown leaves behind);
    // everything else is the dominant mode the quantizers were
    // accepted on. Low minority ids (1,5,9,13,17) sit inside the
    // id-prefix sample, the retrain-follows precondition the
    // retrainIfStale test documents.
    def vec(i: Int): Seq[Float] =
      if (i % 4 == 1) emb(i).map(_ + 20.0f) else emb(i)
    def writeBase(table: String): Unit =
      (0 until 360).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
        .coalesce(1).write.mode("overwrite").parquet(table)

    // answer-parity deletion: both modes thinned evenly — the retained
    // distribution is the accepted one, the signal must stay quiet
    val t1 = s"$root/vecs_parity"
    writeBase(t1)
    val parity = IvfPqIndex(t1, s"$root/idx_parity", m = 4, subDim = 4,
      sampleSize = 19, lloydRounds = 2)
    parity.create(s)
    assert(!parity.staleQuantizer(s), "fresh index must read clean")
    parity.delete(s, s.read.parquet(t1)
      .filter(col("vec_id") % 7 === 3).select("vec_id"))
    assert(!parity.staleQuantizer(s),
      "an answer-parity deletion tripped the retained-fit signal")

    // dominant-mode takedown: the retained corpus is the minority mode
    // the frozen quantizers never fit — no row was re-encoded, so the
    // per-phase drift rows are silent BY CONSTRUCTION and only the
    // retained-fit re-evaluation can see it
    val t2 = s"$root/vecs_take"
    writeBase(t2)
    val idx = IvfPqIndex(t2, s"$root/idx_take", m = 4, subDim = 4,
      sampleSize = 19, lloydRounds = 2)
    idx.create(s)
    assert(!idx.staleQuantizer(s))
    // the table service's base pass runs first (the Takedown ordering
    // contract — retrain re-reads the base), then the index delete
    val retainedRows = s.read.parquet(t2)
      .filter(col("vec_id") % 4 === 1).localCheckpoint(true)
    val tomb = s.read.parquet(t2).filter(col("vec_id") % 4 =!= 1)
      .select("vec_id").localCheckpoint(true)
    retainedRows.coalesce(1).write.mode("overwrite").parquet(t2)
    idx.delete(s, tomb)
    assert(idx.staleQuantizer(s),
      "a dominant-mode takedown must trip the retained-fit drift signal")

    // recall on the survivors before vs after the retrain, against
    // exact L2 ground truth over the retained corpus
    val all = s.read.parquet(t2).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    def l2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val probeIds = all.keys.toSeq.filter(_ % 36 == 1)
    val exact: Set[(Long, Long)] = probeIds.flatMap { p =>
      all.keys.filter(_ != p).toSeq
        .sortBy(n => (l2(all(p), all(n)), n)).take(3).map(p -> _)
    }.toSet
    val probes = s.read.parquet(t2).filter(col("vec_id") % 36 === 1)
      .localCheckpoint(true)
    def recall(): Double = {
      val got = idx.probe(s, probes, k = 3, nprobe = 4)
        .select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val before = recall()
    assert(idx.retrainIfStale(s), "retrainIfStale must fire while stale")
    assert(!idx.staleQuantizer(s),
      "retrain must re-baseline the retained-fit signal")
    val after = recall()
    info(f"recall@3 on the survivors: pre-retrain $before%.3f, post-retrain $after%.3f")
    assert(after > before,
      f"retrain must recover recall on the retained mode ($before%.3f -> $after%.3f)")
  }

  test("probe scans only the probed inverted lists (partition pruning)") {
    val s = spark
    val root = graft.core.Scratch.dir("ivfpq_prune")
    val table = s"$root/vecs"
    writeVecs(table, 0 until 300)
    val idx = IvfPqIndex(table, s"$root/idx", m = 4, subDim = 4,
      sampleSize = 8)
    idx.create(s)
    idx.compact(s) // one file per cluster directory

    val clusters = idx.content(s).select("cluster").distinct().count()
    assert(clusters > 2, s"fixture degenerate: only $clusters clusters")

    val probes = s.read.parquet(table).filter(col("vec_id") === 0L)
    val res = idx.probe(s, probes, k = 3, nprobe = 1)
    res.collect() // executedPlan metrics need the real plan run

    val codeScans = scans(res.queryExecution.executedPlan)
      .filter(_.relation.partitionSchema.nonEmpty)
    assert(codeScans.nonEmpty, "no partitioned codes scan in the probe plan")
    val filesRead = codeScans.map(_.metrics("numFiles").value).sum
    assert(filesRead === 1L,
      s"probe read $filesRead inverted-list files; " +
        s"nprobe=1 over $clusters single-file lists must read exactly 1")
  }
}

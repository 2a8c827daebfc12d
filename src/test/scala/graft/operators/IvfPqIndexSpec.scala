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

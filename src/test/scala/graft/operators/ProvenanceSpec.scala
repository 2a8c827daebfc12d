package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.Path
import graft.SparkTestSession

/** The provenance sidecar's I/O discipline (VERDICT r11 ask #3 +
  * ADVICE r11): fingerprints come from ONE directory listing per
  * distinct parent — not one `getFileStatus` RPC per file, which at a
  * 100k-file append backlog is 100k serial namenode round-trips — and
  * the sidecar's own file count stays BOUNDED under N appends instead
  * of re-growing the small-files problem it polices. Reset must clear
  * the sidecar even when the new base is empty, or the old base's
  * rows report phantom staleness forever.
  */
class ProvenanceSpec extends AnyFunSuite with SparkTestSession {

  /** land `n` single-file batches under `table`, returning each
    * batch's new file.
    */
  private def land(table: String, n: Int, offset: Int = 0): Seq[String] = {
    val s = spark; import s.implicits._
    (0 until n).map { b =>
      val before = ZoneMap.dataFiles(s, table).toSet
      Seq((offset + b).toLong).toDF("x")
        .coalesce(1).write.mode("append").parquet(table)
      ZoneMap.dataFiles(s, table).filterNot(before).head
    }
  }

  test("one listing per distinct parent directory per append batch") {
    val s = spark
    val root = graft.core.Scratch.dir("prov_listing")
    val filesA = land(s"$root/ta", 3)
    val filesB = land(s"$root/tb", 2)
    val before = Provenance.listingCalls.get()
    // 5 files under 2 parents → exactly 2 listings, not 5 stat RPCs
    Provenance.record(s, s"$root/prov", filesA ++ filesB)
    assert(Provenance.listingCalls.get() - before === 2,
      "fingerprint fetch is not one listing per parent directory")
    // the fingerprints are still per-file exact
    assert(Provenance.staleFiles(s, s"$root/ta",
      s"$root/prov").forall(p => !filesA.map(IndexStat.canon).contains(p)))
  }

  test("a missing file still fails loudly") {
    val s = spark
    val root = graft.core.Scratch.dir("prov_missing")
    val files = land(s"$root/t", 1)
    intercept[java.io.FileNotFoundException] {
      Provenance.record(s, s"$root/prov",
        files :+ s"$root/t/part-does-not-exist.parquet")
    }
  }

  test("sidecar file count stays bounded under N appends; hashes unchanged") {
    val s = spark
    val root = graft.core.Scratch.dir("prov_bounded")
    val table = s"$root/t"
    val n = Provenance.AutoCompactFiles * 2 + 5
    val files = land(table, n)
    files.foreach(f => Provenance.record(s, s"$root/prov", Seq(f)))
    val sidecarFiles = IndexStat.liveStatus(s, s"$root/prov").size
    assert(sidecarFiles <= Provenance.AutoCompactFiles + 1,
      s"sidecar re-grew the small-files problem: $sidecarFiles files after $n appends")
    // content unchanged by the auto-folds: every landed file recorded,
    // nothing stale, nothing phantom
    val recorded = s.read.parquet(s"$root/prov")
      .select("file").distinct().count()
    assert(recorded === n.toLong)
    assert(Provenance.staleFiles(s, table, s"$root/prov").isEmpty)
  }

  test("reset with an EMPTY base clears phantom staleness (ADVICE r11)") {
    val s = spark
    val root = graft.core.Scratch.dir("prov_reset")
    val table = s"$root/t"
    val files = land(table, 2)
    Provenance.reset(s, s"$root/prov", files)
    // the base table is emptied (files deleted)
    val fs = new Path(table).getFileSystem(s.sparkContext.hadoopConfiguration)
    files.foreach(f => fs.delete(new Path(f), false))
    assert(Provenance.staleFiles(s, table, s"$root/prov").nonEmpty,
      "precondition: deleted files must read as stale before the reset")
    // reset over the empty base must clear the OLD sidecar too — the
    // exact failure mode the reset verb exists to prevent
    Provenance.reset(s, s"$root/prov", Seq.empty)
    assert(Provenance.staleFiles(s, table, s"$root/prov").isEmpty,
      "reset(empty) left the old sidecar reporting phantom staleness")
  }

  test("MinhashDedupIndex survives a new adapter instance after compact (ADVICE r11)") {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("prov_remount")
    val table = s"$root/base"
    (0 until 60).map { i =>
      (i.toLong, (0 until 8).map(t => s"tok${(i * 7 + t) % 23}").mkString(" "))
    }.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(table)

    val idx1 = MinhashDedupIndex(table, "text", "doc_id",
      "prov_remount_dd", s"$root/dd", buckets = 4)
    idx1.create(s)
    idx1.compact(s) // drops the generation-0 catalog table
    val afterCompact = idx1.content(s).count()

    // a FRESH adapter over the same (table, path) — a new session's
    // view — must resolve the persisted generation, not start at 0
    // and target the dropped base table
    val idx2 = MinhashDedupIndex(table, "text", "doc_id",
      "prov_remount_dd", s"$root/dd", buckets = 4)
    assert(idx2.content(s).count() === afterCompact,
      "fresh adapter did not resolve the persisted generation")
    // …and its append targets the LIVE generation
    val before = ZoneMap.dataFiles(s, table).toSet
    (100 until 110).map { i =>
      (i.toLong, (0 until 8).map(t => s"tok${(i * 3 + t) % 19}").mkString(" "))
    }.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(table)
    val landed = ZoneMap.dataFiles(s, table).filterNot(before).toSeq
    idx2.append(s, landed)
    assert(idx2.content(s).count() > afterCompact)
    assert(idx1.content(s).count() === idx2.content(s).count(),
      "two adapters over the same index disagree")
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.llm.{MediaRecord, Multimodal}

/** The persisted perceptual-hash index's own lifecycle guarantees
  * (VERDICT r15 ask #2), beyond the shared PersistedIndexSpec
  * contract: an append-maintained index must equal a from-scratch
  * rebuild (IvfPqIndexSpec's posture), the pairs probe must equal the
  * one-shot x91 operator without re-running the decode stage, and
  * deletion must re-elect representatives in EXACTLY the hash groups
  * whose kept rep died — untouched rows verbatim (the DedupSpec
  * poison discipline).
  */
class PerceptualHashIndexSpec extends AnyFunSuite with SparkTestSession {

  private def payload(i: Int, rnd: scala.util.Random): Array[Byte] =
    Array.fill(64 + rnd.nextInt(200))(rnd.nextInt(256).toByte)

  /** doc_id → media corpus: bases, exact renditions (2× upscale, the
    * fingerprint-identical star-edge food), and one light corruption
    * per 5th base (the banded join's true positives).
    */
  private def corpus(ids: Range, seed: Long): Seq[(Long, Array[Byte])] = {
    val rnd = new scala.util.Random(seed)
    ids.flatMap { i =>
      val base = payload(i, rnd)
      val up = Multimodal.upscaleStub(
        MediaRecord(i.toLong, base, "m", "l", "s"), 2).media
      val corrupt = { val c = up.clone(); c((30L * c.length / 61L).toInt) = 'z'.toByte; c }
      Seq((i.toLong, base), (i.toLong + 1000L, up)) ++
        (if (i % 5 == 0) Seq((i.toLong + 2000L, corrupt)) else Nil)
    }
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet

  test("append-maintained index equals a from-scratch rebuild, and the " +
    "pairs probe equals the one-shot operator (decode never re-runs)") {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("phidx")
    val table = s"$root/media"
    // landing 1 (create), landing 2 (append; monotone ids, so kept
    // reps remain group minima — the pair-listing caveat the scaladoc
    // documents)
    corpus(0 until 30, 7L).toDF("doc_id", "media")
      .coalesce(1).write.mode("append").parquet(table)
    val idx = PerceptualHashIndex(table, "media", "doc_id", s"$root/ph")
    idx.create(s)
    val before = ZoneMap.dataFiles(s, table).toSet
    corpus(3000 until 3020, 8L).map { case (id, b) => (id + 7000L, b) }
      .toDF("doc_id", "media")
      .coalesce(1).write.mode("append").parquet(table)
    val landed = ZoneMap.dataFiles(s, table).filterNot(before)
    idx.append(s, landed)
    assert(idx.staleFiles(s).isEmpty)

    val rebuilt = PerceptualHashIndex(table, "media", "doc_id", s"$root/ph_scratch")
    rebuilt.create(s)
    def rel(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rel(idx.content(s)) === rel(rebuilt.content(s)),
      "append-maintained fps diverged from a from-scratch rebuild")
    assert(rel(idx.reps(s)) === rel(rebuilt.reps(s)),
      "append-maintained reps diverged from a from-scratch rebuild")

    // the probe equals the one-shot operator over fresh fingerprints
    val fresh = Multimodal.perceptualNearDupPairs(
      Multimodal.fingerprints(s.read.parquet(table), "media", "doc_id"),
      "doc_id", "ph")
    assert(pairSet(idx.pairs(s)) === pairSet(fresh))

    // compact is layout-only
    val beforeCompact = pairSet(idx.pairs(s))
    idx.compact(s)
    assert(pairSet(idx.pairs(s)) === beforeCompact)
  }

  test("delete re-elects exactly the dead-rep hash groups; untouched " +
    "reps rows pass through verbatim") {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("phidx_del")
    val table = s"$root/media"
    corpus(0 until 40, 17L).toDF("doc_id", "media")
      .coalesce(1).write.parquet(table)
    val idx = PerceptualHashIndex(table, "media", "doc_id", s"$root/ph")
    idx.create(s)
    val repsBefore = idx.reps(s).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // tombstones: id 3 — the REP of its exact group {3, 1003} (min id)
    // — plus 1007, a NON-rep member of {7, 1007}: only group(3)'s rep
    // must re-elect (to 1003); group(7) keeps rep 7 verbatim
    val tomb = Seq(3L, 1007L).toDF("doc_id")
    idx.delete(s, tomb)

    assert(idx.content(s).filter(col("doc_id").isin(3L, 1007L)).isEmpty)
    val repsAfter = idx.reps(s).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val deadGroups = repsBefore.filter(_._1 == 3L).map(_._2)
    assert(deadGroups.nonEmpty, "fixture: id 3 was not a kept rep")
    // untouched groups' rows byte-identical (set identity on rows)
    assert(repsAfter.filter(r => !deadGroups(r._2)) ===
      repsBefore.filter(r => !deadGroups(r._2) && r._1 != 1007L),
      "a group whose rep survived was perturbed by the delete")
    // the dead-rep group re-elected its next-minimum retained member
    deadGroups.foreach { ph =>
      assert(repsAfter.contains((1003L, ph)),
        s"group $ph did not re-elect the next retained member")
    }

    // the probe equals the one-shot operator over the retained corpus
    val fresh = Multimodal.perceptualNearDupPairs(
      Multimodal.fingerprints(
        s.read.parquet(table).filter(!col("doc_id").isin(3L, 1007L)),
        "media", "doc_id"),
      "doc_id", "ph")
    assert(pairSet(idx.pairs(s)) === pairSet(fresh),
      "post-delete pairs diverged from a fresh pass over retained docs")
  }

  test("the grid dial reaches the decode seam: a 4x16 index fingerprints " +
    "with dhashGridOfBytes(_, 4, 16)") {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("phidx_grid")
    val table = s"$root/media"
    val rows = corpus(0 until 10, 23L)
    rows.toDF("doc_id", "media").coalesce(1).write.parquet(table)
    val idx = PerceptualHashIndex(table, "media", "doc_id", s"$root/ph",
      gridRows = 4, gridCols = 16)
    idx.create(s)
    val got = idx.content(s).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, b) =>
      assert(got(id) === Multimodal.dhashGridOfBytes(b, 4, 16))
    }
  }
}

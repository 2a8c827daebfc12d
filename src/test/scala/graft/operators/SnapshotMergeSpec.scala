package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** SnapshotMerge unit semantics beyond q34's oracle config: insert /
  * update / delete / resurrect across batches, no-op folds, and the
  * upsert-beats-tombstone tie rule.
  */
class SnapshotMergeSpec extends AnyFunSuite with SparkTestSession {

  private def snap(rows: (Long, String, Long)*) = {
    val s = spark; import s.implicits._
    rows.toDF("k", "v", "ver")
  }

  private def chg(rows: (Long, String, Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("k", "v", "ver", "op")
  }

  private def result(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("insert, update, delete fold in one pass") {
    val base = snap((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L))
    val changes = chg(
      (2L, "b2", 1L, "u"), // update
      (3L, "c", 1L, "d"),  // delete
      (4L, "d", 1L, "u"))  // insert
    assert(result(SnapshotMerge(base, changes, Seq("k"), "ver", "op")) ===
      Set((1L, "a", 0L), (2L, "b2", 1L), (4L, "d", 1L)))
  }

  test("empty changes is the identity; merging is re-foldable (delete then resurrect)") {
    val base = snap((1L, "a", 0L), (2L, "b", 0L))
    val empty = chg()
    assert(result(SnapshotMerge(base, empty, Seq("k"), "ver", "op")) ===
      result(base))
    // batch 1 deletes k=2, batch 2 re-inserts it at a later version
    val s1 = SnapshotMerge(base, chg((2L, "b", 1L, "d")), Seq("k"), "ver", "op")
    assert(result(s1) === Set((1L, "a", 0L)))
    val s2 = SnapshotMerge(s1, chg((2L, "b3", 2L, "u")), Seq("k"), "ver", "op")
    assert(result(s2) === Set((1L, "a", 0L), (2L, "b3", 2L)))
  }

  test("same-version tie resolves to the upsert, not the tombstone") {
    val base = snap((1L, "a", 0L))
    val changes = chg((1L, "a2", 5L, "u"), (1L, "a", 5L, "d"))
    assert(result(SnapshotMerge(base, changes, Seq("k"), "ver", "op")) ===
      Set((1L, "a2", 5L)))
  }
}

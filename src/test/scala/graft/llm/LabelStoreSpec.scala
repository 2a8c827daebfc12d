package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The label table's merge-on-read lifecycle (VERDICT r15 ask #5):
  * read-equals-stitch — the store's folded view must equal the scoped
  * relabel's full output whatever the batch stacking — and
  * compact-equals-read. Includes the case a NODE-level stitch cannot
  * express: a touched member that splits into a singleton must vanish
  * from the label table (the drop set is label-based for exactly this).
  */
class LabelStoreSpec extends AnyFunSuite with SparkTestSession {

  private def sigDocs(rows: (Long, Seq[Long])*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "sig")
  }

  // the DedupSpec bridge fixture: A—B—C chained through bridge B (24-long
  // signatures, 12 bands × 2 rows; halves shared pairwise), D an exact
  // pair, plus an exact pair {6,7} for the second delete batch
  private def fixture = {
    val x = (1L to 12L); val y = (501L to 512L); val z = (301L to 312L)
    sigDocs(
      1L -> (x ++ (21L to 32L)), 2L -> (x ++ (21L to 32L)),
      3L -> (x ++ y),
      4L -> (z ++ y), 5L -> (z ++ y),
      6L -> ((601L to 612L) ++ (701L to 712L)),
      7L -> ((601L to 612L) ++ (701L to 712L)),
      10L -> ((801L to 812L) ++ (821L to 832L)),
      11L -> ((801L to 812L) ++ (821L to 832L)))
  }

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("appendDelete: read equals the scoped relabel's stitched output, " +
    "batches stack in sequence, compact preserves the answer") {
    val s = spark; import s.implicits._
    val dir = graft.core.Scratch.dir("labelstore")
    val sigs = fixture
    val prior = Dedup.connectedComponents(
      Dedup.candidatesFromSigs(sigs, "doc_id", assumeUnique = true),
      "doc_a", "doc_b").localCheckpoint(true)
    LabelStore.create(s, dir, prior)
    assert(LabelStore.exists(s, dir))
    assert(labelsOf(LabelStore.read(s, dir)) === labelsOf(prior))

    // batch 1: delete bridge 3 — O(touched) writes, stitched read
    // equals the full scoped verb's output on the same inputs
    LabelStore.appendDelete(s, dir, sigs, Seq(3L).toDF("doc_id"), "doc_id")
    val want1 = labelsOf(Dedup.relabelScopedFromSigs(
      sigs, Seq(3L).toDF("doc_id"), prior, "doc_id"))
    assert(labelsOf(LabelStore.read(s, dir)) === want1)
    assert(want1(4L) === 4L, "fixture: the bridge split must have happened")

    // batch 2 stacks on batch 1's view (sigs still carry node 3 — the
    // scoping excludes prior tombstones because they left the labels):
    // deleting 6 re-elects {7}'s component away (exact pair → 7 alone
    // becomes a singleton and LEAVES the table)
    LabelStore.appendDelete(s, dir, sigs, Seq(6L).toDF("doc_id"), "doc_id")
    val afterTwo = labelsOf(LabelStore.read(s, dir))
    val want2 = labelsOf(Dedup.relabelScopedFromSigs(
      sigs.filter(col("doc_id") =!= 3L), Seq(6L).toDF("doc_id"),
      Dedup.relabelScopedFromSigs(sigs, Seq(3L).toDF("doc_id"), prior,
        "doc_id"), "doc_id"))
    assert(afterTwo === want2)
    assert(!afterTwo.contains(6L) && !afterTwo.contains(7L),
      "the exact pair must be gone: 6 tombstoned, 7 a singleton now")
    assert(afterTwo.contains(10L) && afterTwo.contains(11L))

    // the tombstone sidecar accumulates across batches
    assert(LabelStore.tombstones(s, dir).collect().map(_.getLong(0)).toSet
      === Set(3L, 6L))

    // compact folds the chain: read identical, batches cleared
    LabelStore.compact(s, dir)
    assert(labelsOf(LabelStore.read(s, dir)) === afterTwo)
    assert(LabelStore.seqs(s, dir).isEmpty)
  }

  test("singleton splits vanish (the label-based drop a node stitch " +
    "cannot express), and appendChanged folds an additions batch at " +
    "O(changed) writes") {
    val s = spark; import s.implicits._
    val dir = graft.core.Scratch.dir("labelstore2")
    // chain {1,2,3} through bridge 2; pair {10,11}
    val x = (1L to 12L); val y = (501L to 512L)
    val sigs = sigDocs(
      1L -> (x ++ (21L to 32L)), 2L -> (x ++ y),
      3L -> ((301L to 312L) ++ y),
      10L -> ((801L to 812L) ++ (821L to 832L)),
      11L -> ((801L to 812L) ++ (821L to 832L)))
    val prior = Dedup.connectedComponents(
      Dedup.candidatesFromSigs(sigs, "doc_id", assumeUnique = true),
      "doc_a", "doc_b").localCheckpoint(true)
    LabelStore.create(s, dir, prior)

    // deleting bridge 2 splits {1,2,3} into TWO singletons: the delta
    // is EMPTY, the drop set is the old label — nodes 1 and 3 must
    // vanish from the read, which no node-keyed upsert could do
    LabelStore.appendDelete(s, dir, sigs, Seq(2L).toDF("doc_id"), "doc_id")
    val got = labelsOf(LabelStore.read(s, dir))
    assert(got === Map(10L -> 10L, 11L -> 10L),
      s"singleton-split members must leave the label table, got $got")
    assert(s.read.parquet(s"$dir/delta/seq=0").isEmpty,
      "a split-to-singletons delete writes an EMPTY delta")

    // additions fold: a new fixpoint merging {10,11} under label 1
    // (an arriving doc connected both) — appendChanged writes ONLY the
    // changed rows and drops only their old label
    val newFix = Seq((1L, 1L), (10L, 1L), (11L, 1L)).toDF("node", "label")
    LabelStore.appendChanged(s, dir, newFix)
    assert(labelsOf(LabelStore.read(s, dir)) === labelsOf(newFix))
    val delta1 = s.read.parquet(s"$dir/delta/seq=1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(delta1 === Set((1L, 1L), (10L, 1L), (11L, 1L)),
      "the additions delta must carry exactly the changed/new rows")
  }

  test("appendDelta(incrementalComponentsDelta) — the zero-diff additions " +
    "writer — stitches to exactly the full fold's table") {
    val s = spark; import s.implicits._
    val dir = graft.core.Scratch.dir("labelstore3")
    val prior = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L),
      (20L, 20L), (21L, 20L)).toDF("node", "label")
      .localCheckpoint(true)
    // new node 50 bridges components {1,2} and {10,11}; {20,21} is
    // untouched and must ride the stitch verbatim
    val edges = Seq((50L, 2L), (50L, 10L)).toDF("a", "b")
    val want = Dedup.incrementalComponents(prior, edges, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    LabelStore.create(s, dir, prior)
    val (chg, dropped) = Dedup.incrementalComponentsDelta(prior, edges, "a", "b")
    LabelStore.appendDelta(s, dir, chg, dropped)
    assert(labelsOf(LabelStore.read(s, dir)) === want)
    // the delta carried only the merged components' rows + the new
    // node — never the untouched component or the unchanged-label rows
    val deltaRows = s.read.parquet(s"$dir/delta/seq=0")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(deltaRows === Set((10L, 1L), (11L, 1L), (50L, 1L)),
      s"delta must be the remapped rows + the new node, got $deltaRows")
    // the drop set: the losing component's label, plus the new node's
    // label-graph self-label (50) — vacuously safe: a base row with
    // label 50 would mean node 50 was already clustered, contradicting
    // it being new, so dropping it is a no-op by construction
    assert(s.read.parquet(s"$dir/drop/seq=0")
      .collect().map(_.getLong(0)).toSet === Set(10L, 50L))
  }
}
